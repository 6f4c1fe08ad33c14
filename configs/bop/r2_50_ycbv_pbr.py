# Res2Net-50 (scales=4, 26w) variant of the YCB-V flagship — demonstrates
# the multi-scale backbone surface (mmcv registers Res2Net alongside ResNet,
# /root/reference/radet/models/backbones/res2net.py; no shipped reference
# config uses it, this is an extension config).  Res2Net pins the V1d deep
# stem + avg-down downsample (res2net.py:330-333); the builder applies both.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        type="Res2Net",
        depth=50,
        scales=4,
        base_width=26,
    ),
)
