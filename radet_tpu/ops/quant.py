"""Deploy-time int8 quantization primitives (PTQ, checkpoint-compatible).

The v5e MXU multiplies int8 at 2x the bf16 rate, and — more importantly for
the HBM-bound backbone stages — an int8 activation tensor is half the bytes
of bf16 on every producer write and consumer read.  The recipe:
per-output-channel symmetric weight quantization computed from the live
f32 kernel at trace time (XLA constant-folds it — no converted checkpoint
or calibration pass), PER-CHANNEL symmetric activation quantization with
STATIC scales derived from the preceding normalization layer's affine
parameters, int32 MXU accumulation, dequant folded into the consumer.

Static activation bounds: a normalization layer (GroupNorm, or frozen-stats
BatchNorm evaluated on-distribution) standardizes its input to ~unit
variance per channel, so channel c is bounded by ``k`` standard deviations
of the affine: ``k*|gamma_c| + |beta_c|``.  A violating value is rare
(absmax of millions of standardized samples is ~4.7 sigma; producers pick k
per measured sweep) and symmetric clipping of such outliers is standard
clip-calibration PTQ.  Because the bounds depend only on parameters, XLA
constant-folds the scales and fuses the quantize into the norm layer's
epilogue — the inter-layer tensor is written once, as int8 — while the
consuming Int8Conv folds the per-channel scales into its constant weights
(cross-layer equalization), so no runtime rescale exists at all.

Every module here keeps the param tree IDENTICAL to the float conv it
replaces (a single ``kernel``), so trained/converted checkpoints load
unchanged and int8 is a deploy-time switch, not a different model.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quantize_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization; ``scale`` is a scalar (per-tensor) or a
    (C,) vector (per-channel, broadcast over the trailing channel axis)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )


def affine_act_scale(gamma: jnp.ndarray, beta: jnp.ndarray, k: float = 8.0):
    """Static PER-CHANNEL activation scales from a norm layer's affine.

    Channel bound = k*|gamma_c| + |beta_c|; scale_c = bound_c / 127.  Valid
    for any layer whose pre-affine value is ~unit-variance per channel
    (GroupNorm always; frozen-running-stats BatchNorm on-distribution).

    Per-channel matters: a per-tensor max-over-channels bound makes the
    quantization step huge relative to low-variance channels (measured on
    the r50 trunk: 6.5% relative feature error at C2 compounding to 33% at
    C5).  Per-channel scales cost nothing at runtime — the consumer Int8Conv
    folds them into its constant weights (cross-layer equalization), so the
    conv's int8 input uses the full range in every channel.
    """
    bound = k * jnp.abs(gamma) + jnp.abs(beta)
    return jnp.maximum(bound, 1e-6) / 127.0


def _scale_fold(x_scale, cin, groups, features):
    """Broadcastable (1, 1, cin, features) fold of per-input-channel
    activation scales onto an HWIO kernel; for grouped convs,
    kernel[:, :, i, o] consumes input channel g(o)*cin + i."""
    if groups == 1:
        return x_scale[None, None, :, None]
    fpg = features // groups
    s = x_scale.reshape(groups, cin).T  # (i, g)
    return (
        jnp.repeat(s[:, :, None], fpg, axis=-1)  # (i, g, j)
        .reshape(cin, features)[None, None]
    )


class Int8Conv(nn.Module):
    """Int8-quantized conv with a float-conv-identical param tree.

    Accepts either a float input (quantized here — with ``x_scale`` if the
    caller knows a static bound, else a dynamic absmax reduce) or an
    ALREADY-QUANTIZED int8 input + its scale (the zero-cost inter-block
    path: the producer fused the quantize into its norm epilogue).
    Accumulates in int32 on the MXU; the dequantized output is stored in
    ``out_dtype`` (bf16 halves the bytes the following norm layer reads; it
    still reduces in f32).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1))
    feature_group_count: int = 1
    kernel_init: Callable = nn.initializers.normal(0.01)
    out_dtype: Dtype = jnp.bfloat16
    # bias matches nn.Conv's param tree when the float conv it replaces has
    # one (e.g. the FPN lateral convs); added after dequant in f32
    use_bias: bool = False
    bias_init: Callable = nn.initializers.zeros
    # QAT mode: float conv over STE fake-quantized weight/input — the
    # forward sees exactly the deploy grid (same scales), gradients flow to
    # the float params (fake_quant_ste).  Input must be float here; the
    # caller passes the SAME static scale deploy will use.  Only active
    # while TRAINING (``train=True`` at call time): at eval a qat module
    # runs the true int8 deploy arithmetic, so in-training validation
    # measures exactly what ships.
    qat: bool = False

    @nn.compact
    def __call__(self, x, x_scale=None, train: bool = False):
        kh, kw = self.kernel_size
        groups = self.feature_group_count
        cin = x.shape[-1] // groups
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features), jnp.float32
        )
        if self.qat and train:
            assert x.dtype != jnp.int8, "QAT fake-quant consumes float inputs"
            xf = x.astype(jnp.float32)
            s_x = x_scale if x_scale is not None else (
                jax.lax.stop_gradient(jnp.max(jnp.abs(xf))) / 127.0
            )
            x_fq = fake_quant_ste(xf, jnp.maximum(s_x, 1e-12))
            if x_scale is not None and jnp.ndim(x_scale) == 1:
                # deploy folds the per-channel activation scales into the
                # kernel BEFORE quantizing it (below), so the deploy weight
                # grid lives on the folded kernel — fake-quant the same
                # folded kernel and unfold, making the QAT forward equal the
                # deploy int8 arithmetic exactly (not just to an extra
                # weight-rounding ~1/127)
                fold = _scale_fold(x_scale, cin, groups, self.features)
                k_fq = fake_quant_weight_ste(kernel * fold) / fold
            else:
                k_fq = fake_quant_weight_ste(kernel)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            # the conv itself runs f32: x_fq/k_fq sit exactly on the deploy
            # int8 grid, and f32 accumulation of on-grid products matches the
            # deploy int32 accumulation to rounding of the s_x*s_w products —
            # a bf16 conv here would perturb the grid by ~2^-9 relative and
            # break the "forward sees the deploy arithmetic" contract
            # (tests/test_quant_ops.py pins the match)
            out = jax.lax.conv_general_dilated(
                x_fq,
                k_fq,
                self.strides,
                tuple(self.padding),
                dimension_numbers=dn,
                feature_group_count=groups,
            )
            if self.use_bias:
                out = out + self.param(
                    "bias", self.bias_init, (self.features,), jnp.float32
                )
            return out.astype(self.out_dtype)
        per_channel = x_scale is not None and jnp.ndim(x_scale) == 1
        if per_channel:
            # Fold the per-input-channel activation scales into the constant
            # kernel (cross-layer equalization): sum_c w[c,o] * (s_c * xq_c)
            # == sum_c (w[c,o]*s_c) * xq_c.  Zero runtime cost — the fold
            # happens on weights XLA constant-folds anyway — and the int8
            # input uses the full range in EVERY channel.
            kernel = kernel * _scale_fold(x_scale, cin, groups, self.features)
            s_x = 1.0
            assert x.dtype == jnp.int8, "per-channel scales require int8 input"
            x_q = x
        elif x.dtype == jnp.int8:
            assert x_scale is not None, "int8 input requires its scale"
            x_q, s_x = x, x_scale
        else:
            x_f = x.astype(jnp.float32)
            s_x = x_scale if x_scale is not None else jnp.max(jnp.abs(x_f)) / 127.0
            s_x = jnp.maximum(s_x, 1e-12)
            x_q = quantize_int8(x_f, s_x)
        s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # (Cout,)
        s_w = jnp.maximum(s_w, 1e-12)
        w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            self.strides,
            tuple(self.padding),
            dimension_numbers=dn,
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            out = out + self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return out.astype(self.out_dtype)


def fake_quant_ste(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Quantize->dequantize in float with straight-through gradients.

    The QAT primitive: forward sees exactly the symmetric-int8 grid values
    the deploy-time Int8Conv computes with (same ``scale`` semantics —
    scalar per-tensor or (C,) per-channel over the trailing axis), while the
    backward pass treats the rounding as identity, so gradients flow to the
    underlying float parameter/activation (Bengio et al.'s straight-through
    estimator, the standard QAT recipe).  ``scale`` itself receives no
    gradient through the quantization (it sits inside the stop_gradient),
    matching the static-scale deployment where scales are recomputed from
    the fine-tuned norm affines by the same formula.
    """
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0) * scale
    return (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)


def fake_quant_weight_ste(kernel: jnp.ndarray) -> jnp.ndarray:
    """STE fake-quant of a conv kernel with Int8Conv's own per-output-channel
    symmetric scales (absmax over the (kh, kw, cin) axes / 127), so QAT
    training sees the exact weight grid deployment will use."""
    s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    s_w = jax.lax.stop_gradient(jnp.maximum(s_w, 1e-12))
    return fake_quant_ste(kernel, s_w)
