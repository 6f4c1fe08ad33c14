# ResNeSt-50 variant of the YCB-V flagship — demonstrates the
# split-attention backbone surface (mmcv registers ResNeSt alongside ResNet,
# /root/reference/radet/models/backbones/resnest.py; no shipped reference
# config uses it, this is an extension config).  ResNeSt extends ResNetV1d
# (deep stem + avg-down, resnest.py:271) with radix-2 split-attention 3x3s
# and stride-by-avg-pool.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        type="ResNeSt",
        depth=50,
        radix=2,
        reduction_factor=4,
    ),
)
