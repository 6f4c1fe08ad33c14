# Conv2-only trunk int8 deploy variant of the YCB-V flagship.
#
# Middle point between the head-only r50_ycbv_pbr_int8.py and the full
# r50_ycbv_pbr_int8_full.py: the head tower and the backbone's 3x3 trunk
# convs (conv2) run int8, but the 1x1 output projections (conv3) stay
# bf16.  Motivation: on a converged flagship-scale synthetic model the
# trained-network AP split (tools/validate_learning.py --int8-eval,
# 256-image run, float mAP 0.993; the less-converged 64-image fixture in
# parentheses) is
#
#   head-only   mAP50 -0.000  mAP +0.000 (-0.008)   (free)
#   conv2-only  mAP50 -0.000  mAP -0.010 (-0.037)   (this config)
#   full trunk  mAP50 -0.006  mAP -0.018 (-0.054)
#
# i.e. the trunk's strict-IoU cost is split between the 3x3s and the 1x1
# projections; keeping the projections float recovers part of the delta
# while retaining most of the HBM-byte savings (the 3x3s carry the large
# activations).  Same static frozen-BN-derived per-channel scales and
# identical param tree as the other variants (docs/DESIGN.md 12).
#
# Incompatible with --fuse-conv-bn (folding erases the BN affine the
# static scales derive from; tools/test.py fails fast).
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        quant="int8_conv2",
    ),
    bbox_head=dict(
        quant="int8",
    ),
)
