# Full-int8 deploy variant of the YCB-V flagship: head tower AND backbone.
#
# On top of the head-tower quantization (r50_ycbv_pbr_int8.py), the
# backbone's conv2/conv3 trunk convs run int8 with static per-channel
# activation scales derived from the frozen-BN affine
# (models/resnet.py::_bn_act_scale, ops/quant.py).  The residual-stream
# convs (conv1/downsample) stay bf16 — their input range accumulates
# across blocks via the identity adds and has no static per-channel bound.
#
# Why: the backbone's early stages are HBM-bound (docs/DESIGN.md 9), so
# int8 halves the activation bytes on both the producer write (quantize
# fused into the BN+ReLU epilogue) and the consumer read.
#
# Accuracy envelope: the trunk quantization adds noise of the same order
# as bf16 rounding itself (~1.6x, pinned per-level by
# tests/test_int8_deploy.py on the calibrated-stats parity fixture).  On a
# TRAINED network it costs strict-IoU localization: `tools/
# validate_learning.py --int8-eval` (256-image flagship-scale convergence
# run, float mAP 0.993; eval the same weights through each variant)
# measures mAP50 -0.006 / mAP -0.018 for this full path (head-only is
# free at +0.000; conv2-only backbone.quant='int8_conv2' sits between at
# mAP -0.010).  An earlier, less-converged 64-image fixture measured
# -0.054 — the delta is fixture-dependent and shrinks as the float model
# hardens.  This variant trades bounded strict-IoU mAP for +10%
# throughput over head-only — run
# tools/compare_ap.py against the bf16 config on your real validation
# split before deploying (docs/PARITY_RUNBOOK.md), and fall back to
# r50_ycbv_pbr_int8.py (measured-free: mAP50 +0.000, mAP -0.008) if the
# AP delta matters.
#
# Param tree is identical to the bf16 model (deploy-time switch).
# Incompatible with --fuse-conv-bn (folding erases the BN affine the
# static scales derive from; tools/test.py fails fast).
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        quant="int8",
    ),
    bbox_head=dict(
        quant="int8",
    ),
)
