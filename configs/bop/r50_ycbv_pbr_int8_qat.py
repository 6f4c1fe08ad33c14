# QAT fine-tuning recipe for the int8 deploy variants.
#
# Trains with straight-through-estimator fake-quantization at the EXACT
# static scales the deploy path uses (ops/quant.py::fake_quant_ste wired
# through models/resnet.py / models/radet_head.py ``qat``): the forward
# pass sees the deploy-time int8 grid, gradients flow to the float params,
# and the norm affines the scales derive from are themselves fine-tuned.
# Deploying the resulting checkpoint with quant='int8_stream' (and
# qat removed) runs the arithmetic the network was trained under — the
# standard recipe for recovering PTQ accuracy loss (measured on the
# 256-image flagship-scale fixture: full-stream PTQ costs mAP -0.053, and
# 300 QAT steps recover 75% of it, mAP50 back to 1.000; docs/DESIGN.md 12).
#
# Usage: fine-tune FROM a converged float checkpoint —
#   python tools/train.py configs/bop/r50_ycbv_pbr_int8_qat.py \
#       --cfg-options load_from=work_dirs/r50_ycbv_pbr/latest.ckpt
# then deploy with configs/bop/r50_ycbv_pbr_int8_stream.py.  A short
# schedule at a reduced peak LR is standard for QAT fine-tuning; override
# total_iters/lr for your budget.  Param tree is unchanged, so the float
# checkpoint loads directly and the QAT output deploys directly.
#
# tools/validate_learning.py --qat measures the end-to-end recovery loop
# on the synthetic fixture (train float -> PTQ deploy-eval -> QAT fine-tune
# -> deploy-eval the fine-tuned weights; prints the recovered fraction of
# the PTQ gap).  tests/test_quant_ops.py pins the STE primitives (forward
# on the exact deploy grid, straight-through gradients, qat inert at eval)
# and tests/test_int8_deploy.py::test_stream_qat_forward_matches_deploy
# pins that the QAT train forward tracks the int8_stream deploy forward.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    backbone=dict(
        quant="int8_stream",
        qat=True,
    ),
    bbox_head=dict(
        quant="int8",
        qat=True,
    ),
)

# QAT fine-tune schedule: 1/10 the flagship peak LR, short OneCycle
optimizer = dict(lr=4e-5)
lr_config = dict(total_iters=10010)
runner = dict(max_iters=10000)
