# Maximum-throughput int8 deploy variant: head tower + backbone trunk AND
# the backbone residual stream itself carried as int8.
#
# On top of r50_ycbv_pbr_int8_full.py, the inter-block residual tensor is
# quantized with static per-channel bounds accumulated across blocks
# (means add linearly, variances add in quadrature — models/resnet.py::
# _bn_affine_stats), the stem maxpool runs on int8, and conv1/downsample
# consume the int8 stream directly with their scales folded into constant
# weights.  This removes the last bf16 tensors from the HBM-bound early
# stages: every backbone activation that crosses HBM is int8.
#
# Accuracy envelope: the stream quantization adds noise ~2.7x the bf16
# trunk's own rounding envelope per level (measured 2.59-2.88x, vs
# 1.47-1.69x for _int8_full; tests/test_int8_deploy.py::
# test_trunk_int8_stream_noise_ratio and ::test_trunk_int8_noise_within_
# bf16_envelope pin both ratios on the calibrated-stats parity fixture),
# flat across depth — the quadrature bound does not compound.
# Trained-network cost (tools/validate_learning.py, 256-image
# flagship-scale convergence run, float mAP 0.993): PTQ mAP -0.053 /
# mAP50 -0.007 — vs -0.018 for _int8_full — and QAT fine-tuning
# (r50_ycbv_pbr_int8_qat.py) measured back 75% of that gap in 300 steps
# (mAP50 1.000): this config's exact arithmetic is what the QAT recipe
# trains against.  Measure on your validation split before deploying
# (tools/compare_ap.py, docs/PARITY_RUNBOOK.md).  Measured throughput:
# 1471 img/s batch-128 (+47% over bf16; bench.py measures it live).
#
# Param tree is identical to the bf16 model (deploy-time switch).
# Incompatible with --fuse-conv-bn (folding erases the BN affine the
# static scales derive from; tools/test.py fails fast).
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        quant="int8_stream",
    ),
    bbox_head=dict(
        quant="int8",
    ),
)
