# Frozen-stage int8 TRAINING variant of the YCB-V flagship
# (models/resnet.py::ResNet.frozen_int8; measured and OFF the recommended
# path — see the measurement below).
#
# The flagship recipe freezes stem+layer1 (frozen_stages=1,
# reference resnet.py:573-584 — frozen means eval-mode modules +
# stop_gradient + masked optimizer).  Those are exactly the stride-4
# stages that are HBM-bandwidth-bound in the train forward
# (docs/DESIGN.md 9/10).  This config runs that frozen prefix with the
# int8_stream DEPLOY arithmetic during training: frozen BN running stats
# give valid static activation scales, no gradient ever traverses the
# rounding (the stop_gradient boundary is downstream of every quantized
# op), and the param tree is unchanged — checkpoints interchange freely
# with r50_ycbv_pbr.py.
#
# MEASURED (tools/profile_train.py --step-only --frozen-int8, v5e,
# batch 16 480x640): 46.8 ms/step vs the 43.6 ms bf16 baseline — at
# train batch sizes the added quantize/dequantize traffic outweighs the
# halved activation bytes, so this flag does NOT pay on the flagship
# recipe (the identical lever wins +19% at inference batch 128, DESIGN
# 12).  It is kept as a tested, measured option for regimes where the
# frozen stages are truly bandwidth-saturated (much larger inputs).
#
# Numerics: the trainable stages see frozen features carrying the
# measured int8_stream noise envelope (~2.7x bf16's own rounding per
# level, tests/test_int8_deploy.py); eval/deploy runs the plain float
# path (the flag is train-only).  tests/test_frozen_int8.py pins the
# frozen-prefix train forward == the int8_stream deploy forward, and
# tools/validate_learning.py --frozen-int8 A/B-measures the end-to-end
# accuracy delta on the synthetic convergence fixture.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        frozen_int8=True,
    ),
)
