# ResNeXt-50 32x4d variant of the YCB-V flagship — demonstrates the
# backbone-variant surface (mmcv registers ResNeXt/ResNetV1d alongside ResNet,
# /root/reference/radet/models/backbones/resnext.py; no shipped reference
# config uses them, this is an extension config).
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        type="ResNeXt",
        depth=50,
        groups=32,
        base_width=4,
    ),
)
