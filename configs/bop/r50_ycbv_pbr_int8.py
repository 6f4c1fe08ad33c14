# int8-tower deploy variant of the YCB-V flagship.
#
# Flips the head tower's 3x3 convs to int8 (ops/quant.py::Int8Conv):
# per-output-channel symmetric weight quant from the live f32 kernel,
# per-channel activation quant with STATIC scales derived from the
# preceding GroupNorm affine (XLA fuses the quantize into the GN epilogue;
# the consumer folds the scales into its constant weights), int32 MXU
# accumulation.  The param tree is identical to the bf16 model, so any
# trained/converted r50_ycbv_pbr checkpoint loads unchanged — this is a
# deploy-time switch, not a different model.  The v5e MXU multiplies int8
# at 2x the bf16 rate and the tower runs at 97% of bf16 MXU peak, making
# this the inference throughput lever (bench.py measures both; the
# detection delta vs bf16 is tightly bounded by tests/test_int8_deploy.py,
# and measured FREE on converged flagship-scale synthetic models: mAP
# +0.000 on the 256-image fixture (float mAP 0.993), -0.008 on the
# earlier 64-image one — tools/validate_learning.py --int8-eval).
#
# For the larger win (backbone trunk convs too — the HBM-bound stages) see
# r50_ycbv_pbr_int8_full.py.
_base_ = ["./r50_ycbv_pbr.py"]

model = dict(
    bbox_head=dict(
        quant="int8",
    ),
)
