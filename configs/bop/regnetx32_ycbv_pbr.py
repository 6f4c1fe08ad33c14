# RegNetX-3.2GF variant of the YCB-V flagship — demonstrates the RegNet
# backbone surface (mmcv registers RegNet alongside ResNet,
# /root/reference/radet/models/backbones/regnet.py; no shipped reference
# config uses it, this is an extension config).  Stage widths/blocks come
# from the quantized-linear generator (regnet.py:221-252): 3.2GF =
# widths (96, 192, 432, 1008), blocks (2, 6, 15, 2), group width 48.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        type="RegNet",
        arch="regnetx_3.2gf",
        # depth/out_indices/frozen_stages inherit from the base config
    ),
)
