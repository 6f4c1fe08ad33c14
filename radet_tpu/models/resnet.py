"""ResNet backbone (flax.linen, NHWC, bf16-friendly).

Capability-parity with the reference mmcv ResNet used by RADet
(/root/reference/radet/models/backbones/resnet.py; config
configs/bop/r50_ycbv_pbr.py:14-22): depth-50 bottleneck net, ``pytorch`` style
(stride on the 3x3 conv), ``norm_eval=True`` (BatchNorm always uses running
statistics — the reference never updates BN during detector training),
``frozen_stages=1`` (stem + layer1 excluded from training; realized here as a
``stop_gradient`` on the stage-1 output plus an optimizer mask built by
``radet_tpu.engine.optim.frozen_param_mask``).

Padding is explicit-numeric (not SAME) so activations match torch's
convolution arithmetic exactly — required for imported-checkpoint parity.

Variants (same reference file registers ResNetV1d; resnext.py registers
ResNeXt): ``deep_stem``/``avg_down`` give ResNetV1d, ``groups``/``base_width``
give ResNeXt (grouped 3x3 via ``feature_group_count`` — XLA lowers grouped
convs onto the MXU directly, no channel-split loop needed).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import Int8Conv, affine_act_scale, fake_quant_ste, quantize_int8

# layer counts per depth
ARCH = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

Dtype = Any


class FrozenAwareBN(nn.Module):
    """BatchNorm that matches mmcv ``norm_eval`` semantics.

    With ``norm_eval=True`` (the RADet default) running statistics are used in
    both train and eval, and never updated — i.e. a constant affine transform
    whose scale/bias remain trainable.
    """

    dtype: Dtype = jnp.float32
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        return nn.BatchNorm(
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32, groups=1):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


def _avg_down(x, stride):
    """torch ``AvgPool2d(stride, stride, ceil_mode=True, count_include_pad=False)``.

    Used by the V1d/avg_down downsample path
    (/root/reference/radet/models/backbones/resnet.py ``avg_down=True``):
    ceil-mode pooling pads bottom/right, and padded cells are excluded from
    the mean (count_include_pad=False) — realized by summing zero-padded
    values and dividing by the per-window count of real cells.
    """
    if stride == 1:
        return x
    _, h, w, _ = x.shape
    ph, pw = (-h) % stride, (-w) % stride
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    summed = nn.avg_pool(xp, (stride, stride), strides=(stride, stride), padding="VALID")
    if ph == 0 and pw == 0:
        return summed
    ones = jnp.pad(jnp.ones((1, h, w, 1), x.dtype), ((0, 0), (0, ph), (0, pw), (0, 0)))
    frac = nn.avg_pool(ones, (stride, stride), strides=(stride, stride), padding="VALID")
    return summed / frac


class StemConvS2D(nn.Module):
    """7x7/2 RGB stem conv computed via space-to-depth (MLPerf ResNet trick).

    A 3-input-channel 7x7 conv uses 3/128 of the MXU's contraction width
    (measured 14 TF/s, the worst op in the train step).  Rewriting the input
    as (H/2, W/2, 12) space-to-depth blocks and the kernel as an equivalent
    4x4 stride-1 conv quadruples the contraction width and spatial
    efficiency while performing the *identical* multiply-adds (the kernel is
    zero-padded 7->8 and regrouped; outputs match the plain conv to float
    associativity).  The stored parameter keeps the canonical
    (7, 7, 3, features) shape and the ``conv1/kernel`` path, so checkpoint
    import/export is unaffected.  Requires even H and W (guaranteed by the
    even input sizes every config uses; ResNet falls back to the plain conv
    otherwise).

    Measured on v5e and left OFF by default (``use_s2d``): at the production
    shapes the stem is HBM-bound, not MXU-bound — batch-128 inference is
    time-neutral (2.69 ms either way) and the batch-16 train step is 0.6 ms
    *slower* with the extra space-to-depth transpose.  The flag exists for
    shapes/chips where the stem is compute-bound (the classic MLPerf regime).
    """

    features: int = 64
    dtype: Dtype = jnp.float32
    use_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, c, self.features),
            jnp.float32,
        )
        if not self.use_s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2),
                ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # input blocks: (b, h/2, w/2, (dy, dx, c))
        x2 = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        # kernel: zero-pad 7->8 at the leading edge (pad 3 -> effective 4),
        # regroup (2u+dy, 2v+dx, c, o) -> (u, v, (dy, dx, c), o)
        k8 = jnp.zeros((8, 8, c, self.features), kernel.dtype).at[1:, 1:].set(kernel)
        k4 = (
            k8.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            k4.astype(self.dtype),
            (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


# k-sigma factor shared by every static int8 activation bound in the trunk
# (see _bn_act_scale for the measured k-sweep that picked 4).
_STREAM_K = 4.0


def _bn_affine_stats(bn: FrozenAwareBN):
    """Per-channel (|mean| bound, variance) of a post-BN tensor, from params.

    FrozenAwareBN standardizes with RUNNING stats, so on-distribution the
    post-affine tensor has per-channel mean ~beta and std ~|gamma|.  These
    are the accumulation-friendly form of the k-sigma bound: across a
    residual add the mean bounds add linearly and the variances add in
    quadrature (independence approximation between the block branch and the
    identity stream — residual branches are decorrelated enough in practice
    that the quadrature bound holds with the same k=4 margin; the pure
    triangle-inequality alternative grows linearly with stage depth and was
    measured to double the quantization step by layer3).  Constants at trace
    time, so XLA folds every derived scale.
    """
    p = bn.variables["params"]["BatchNorm_0"]
    return jnp.abs(p["bias"]), p["scale"] ** 2


def _stream_scale(stats):
    """(mean bound, var) -> per-channel symmetric int8 scale, k-sigma rule.

    The stream is non-negative everywhere it is quantized (post-ReLU), so
    symmetric [-127, 127] leaves half the code range unused.  Deliberate:
    (a) XLA's conv requires matching input dtypes, so an unsigned [0, 255]
    stream (uint8) cannot feed the int8-weight MXU conv; (b) an int8
    zero-point encoding (q = round(x/s) - 128) would double resolution but
    adds a `128 * conv(w, 1)` correction that is border-varying under zero
    padding — a full-size constant map whose extra HBM read defeats the
    point of quantizing these HBM-bound stages.  The measured stream-noise
    envelope (~2.7x bf16 rounding, tests/test_int8_deploy.py) already prices
    in the halved range; QAT (r50_ycbv_pbr_int8_qat.py) is the recovery
    lever, not a finer grid.
    """
    mean_b, var_b = stats
    return jnp.maximum(mean_b + _STREAM_K * jnp.sqrt(var_b), 1e-6) / 127.0


def _max_pool_int8(x):
    """torch MaxPool2d(3, stride=2, padding=1) on an int8 tensor.

    reduce_window pads with the init value (-128), which never wins the max
    against real int8 values — the int8 analogue of the -inf pad the float
    path uses.  Max commutes with the monotone quantization, so pooling the
    quantized tensor equals quantizing the pooled tensor exactly; running it
    int8 halves the stem maxpool's HBM bytes (measured 2.4 ms at batch 128).
    """
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _bn_act_scale(bn: FrozenAwareBN, k: float = 4.0):
    """Static per-channel int8 activation scales for a post-BN+ReLU tensor.

    k=4 measured best on the calibrated-stats parity fixture (k-sweep of the
    C2..C5 relative feature error vs f32: k=4 -> 2.6%..15.8%, k=6 ->
    3.7%..21%, k=8 -> 4.8%..25%): the absmax of ~5M standardized samples is
    ~4.7 sigma, so k=4 clips almost nothing while halving the quantization
    step vs k=8.  For context, the production bf16 trunk's own rounding
    noise on the same fixture is 1.8%..9.6% — int8(k=4) adds ~1.6x bf16's
    noise (tests/test_int8_deploy.py pins the ratio).

    FrozenAwareBN standardizes with RUNNING statistics (constants here), so
    on-distribution its pre-affine value is ~unit-variance per channel and
    the per-channel k-sigma affine bound of ops/quant.py::affine_act_scale
    applies — the same derivation as the head tower's GN bound, with BN's
    fitted running stats standing in for GN's exact runtime standardization.
    Depends only on params, so XLA constant-folds the scales, the quantize
    fuses into the BN+ReLU epilogue (the inter-conv tensor is written once,
    int8), and the consuming Int8Conv folds the scales into its weights.
    """
    p = bn.variables["params"]["BatchNorm_0"]
    return affine_act_scale(p["scale"], p["bias"], k)


def _q8_conv(features, kernel, stride, name, groups=1, qat=False):
    """Int8Conv matching _conv's param tree/init (see ops/quant.py)."""
    pad = (kernel - 1) // 2
    return Int8Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        qat=qat,
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; output channels = planes * 4
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    norm_eval: bool = True
    groups: int = 1  # ResNeXt cardinality (grouped 3x3 conv)
    width: int = 0  # mid channels; 0 -> planes (plain ResNet)
    avg_down: bool = False  # V1d: AvgPool + stride-1 1x1 downsample
    expansion: int = 4  # output channels = planes * expansion (RegNet uses 1)
    # deploy-time int8 (eval only; param tree unchanged — ops/quant.py).
    # 'int8' quantizes conv2+conv3; 'int8_conv2' only the 3x3 (keeps the
    # 1x1 output projection bf16 — measured to cost strict-IoU mAP when
    # quantized, tools/validate_learning.py --int8-eval).  Eligible convs
    # have single-consumer post-BN+ReLU inputs with a static _bn_act_scale
    # bound.  'int8_stream' additionally carries the residual stream itself
    # as int8: the caller passes ``stream=(mean bound, var)`` per-channel
    # stats of the int8 input ``x`` (accumulated mean-linearly /
    # variance-in-quadrature across blocks, _bn_affine_stats), conv1 and
    # downsample_conv consume the int8 stream directly, and the block
    # returns ``(y_int8, stats_out)`` with the post-add bound.  These
    # stages are HBM-bound (docs/DESIGN.md 9), so the win is halved
    # activation bytes, not MXU rate.
    quant: Optional[str] = None
    # QAT: in TRAIN mode, mirror the deploy int8 arithmetic with STE
    # fake-quant at the exact same static scales (ops/quant.py::
    # fake_quant_ste), so fine-tuning recovers the PTQ accuracy delta and
    # the deployed int8 model IS the trained forward.  Requires norm_eval
    # (the static scales read frozen running stats).
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, stream=None):
        qat = self.qat and train and self.quant is not None
        live = (not train) or qat  # quantized arithmetic active
        q8_stream = self.quant == "int8_stream" and live and stream is not None
        q8_c2 = self.quant in ("int8", "int8_conv2", "int8_stream") and live
        q8_c3 = self.quant in ("int8", "int8_stream") and live
        identity = x
        width = self.width or self.planes
        cout = self.planes * self.expansion
        if q8_stream:
            s_in = _stream_scale(stream)
            out = _q8_conv(width, 1, 1, "conv1", qat=qat)(x, s_in, train=qat)
        else:
            out = _conv(width, 1, 1, name="conv1", dtype=self.dtype)(x)
        bn1 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")
        out = nn.relu(bn1(out, train))
        # 'pytorch' style: stride lives on the 3x3 conv
        if q8_c2:
            s1 = _bn_act_scale(bn1)
            out = _q8_conv(width, 3, self.stride, "conv2", self.groups, qat=qat)(
                out if qat else quantize_int8(out, s1), s1, train=qat
            )
        else:
            out = _conv(width, 3, self.stride, name="conv2", dtype=self.dtype,
                        groups=self.groups)(out)
        bn2 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn2")
        out = nn.relu(bn2(out, train))
        if q8_c3:
            s2 = _bn_act_scale(bn2)
            out = _q8_conv(cout, 1, 1, "conv3", qat=qat)(
                out if qat else quantize_int8(out, s2), s2, train=qat
            )
        else:
            out = _conv(cout, 1, 1, name="conv3", dtype=self.dtype)(out)
        bn3 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn3")
        out = bn3(out, train)
        ds_bn = None
        if self.has_downsample:
            if q8_stream:
                # avg_down is gated out by ResNet (int8 avg-pool is inexact)
                identity = _q8_conv(cout, 1, self.stride, "downsample_conv",
                                    qat=qat)(x, s_in, train=qat)
            else:
                ds_in = _avg_down(x, self.stride) if self.avg_down else x
                identity = _conv(cout, 1, 1 if self.avg_down else self.stride,
                                 name="downsample_conv", dtype=self.dtype)(ds_in)
            ds_bn = FrozenAwareBN(self.dtype, self.norm_eval, name="downsample_bn")
            identity = ds_bn(identity, train)
        elif q8_stream and not qat:
            # dequantize the int8 stream for the residual add (the second —
            # and only other — read of the stream tensor, still int8 bytes).
            # Under QAT x is already the fake-quantized float stream, which
            # equals this dequantization exactly.
            identity = x.astype(jnp.float32) * s_in
        y = nn.relu(out + identity)
        if not q8_stream:
            return y
        # Post-add bound: block-branch stats from bn3's affine, identity
        # stats from the downsample BN (if any) or the incoming stream.
        # bn3/add/relu/quantize are all elementwise with constant scales, so
        # XLA fuses them into conv3's epilogue and the inter-block tensor is
        # written once, as int8.
        id_stats = _bn_affine_stats(ds_bn) if ds_bn is not None else stream
        m3, v3 = _bn_affine_stats(bn3)
        stats_out = (m3 + id_stats[0], v3 + id_stats[1])
        s_out = _stream_scale(stats_out)
        if qat:
            return fake_quant_ste(y, s_out), stats_out
        return quantize_int8(y, s_out), stats_out


class Bottle2neck(nn.Module):
    """Res2Net block (reference models/backbones/res2net.py:17-163).

    The 3x3 stage splits into ``scales`` channel groups: group 0 goes
    through convs_0; each later group adds the previous group's output
    before its conv ('normal' blocks) or starts fresh ('stage' blocks — the
    first block of each layer, res2net.py:118-127); the last group passes
    through raw (or 3x3 avg-pooled when the stage strides).  Res2Net pins
    the V1d-style deep stem and avg-down downsample (res2net.py:330-333),
    so the downsample here is always AvgPool + stride-1 1x1.

    TPU note: the per-group 3x3 convs are width-26..208 channel convs — XLA
    fuses the adds/concats into the conv epilogues; the concat feeds one
    big 1x1 (MXU-friendly).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    norm_eval: bool = True
    scales: int = 4
    base_width: int = 26

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        width = self.planes * self.base_width // 64  # base_channels=64
        out = _conv(width * self.scales, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(out, train)
        out = nn.relu(out)

        # 'stage' blocks are the per-layer first blocks (built with a
        # downsample in Res2Layer, res2net.py:216-228)
        stage = self.has_downsample
        spx = jnp.split(out, self.scales, axis=-1)
        sps = []
        for i in range(self.scales - 1):
            inp = spx[i] if (stage or i == 0) else sps[-1] + spx[i]
            sp = _conv(width, 3, self.stride, name=f"convs_{i}", dtype=self.dtype)(inp)
            sp = FrozenAwareBN(self.dtype, self.norm_eval, name=f"bns_{i}")(sp, train)
            sps.append(nn.relu(sp))
        if stage and self.stride != 1:
            # torch AvgPool2d(3, stride, padding=1) (count_include_pad=True)
            last = nn.avg_pool(
                spx[-1], (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
            )
        else:
            last = spx[-1]
        out = jnp.concatenate(sps + [last], axis=-1)

        out = _conv(self.planes * 4, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn3")(out, train)
        if self.has_downsample:
            identity = _conv(self.planes * 4, 1, 1, name="downsample_conv",
                             dtype=self.dtype)(_avg_down(x, self.stride))
            identity = FrozenAwareBN(self.dtype, self.norm_eval, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention 3x3 (reference models/backbones/resnest.py:39-147).

    A grouped conv produces ``radix`` branches; a squeeze (global mean) ->
    grouped fc1/BN/fc2 -> radix-softmax gate mixes them.  Channel layouts
    mirror the torch views exactly (branch-major splits, group-major gates)
    so mmcv checkpoints convert weight-for-weight.  The gate math is tiny
    (1x1 convs on a 1x1 map) — XLA keeps it fused; the grouped 3x3 is the
    MXU op.
    """

    channels: int
    stride: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: Dtype = jnp.float32
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, w = self.radix, self.channels
        inter = max(w * r // self.reduction_factor, 32)
        out = _conv(w * r, 3, self.stride, name="conv", dtype=self.dtype,
                    groups=self.groups * r)(x)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn0")(out, train)
        out = nn.relu(out)
        b, h, ww, _ = out.shape
        # branch-major split: torch x.view(b, radix, width, H, W) — channel
        # c = branch * width + k  (resnest.py:126-129)
        splits = out.reshape(b, h, ww, r, w)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)
        gap = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                      dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(gap)
        gap = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(gap, train)
        gap = nn.relu(gap)
        atten = nn.Conv(w * r, (1, 1), feature_group_count=self.groups,
                        dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(gap)
        # radix softmax: fc2's group-major layout c = g*(r*wpg) + branch*wpg + k
        # (RSoftmax, resnest.py:28-36)
        wpg = w // self.groups
        atten = atten.reshape(b, 1, 1, self.groups, r, wpg)
        atten = jax.nn.softmax(atten, axis=4) if r > 1 else jax.nn.sigmoid(atten)
        atten = atten.transpose(0, 1, 2, 4, 3, 5).reshape(b, 1, 1, r, w)
        return jnp.sum(atten.astype(splits.dtype) * splits, axis=3)


class SplitAttentionBottleneck(nn.Module):
    """ResNeSt bottleneck (reference resnest.py:149-268): 1x1 -> split
    attention 3x3 (stride moved to a following 3x3 avg-pool when
    ``avg_down_stride``) -> 1x1, with the V1d avg-down residual path."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    norm_eval: bool = True
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        width = (
            self.planes
            if self.groups == 1
            else (self.planes * self.base_width // 64) * self.groups
        )
        avd = self.avg_down_stride and self.stride > 1
        out = _conv(width, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(out, train)
        out = nn.relu(out)
        out = SplitAttentionConv(
            channels=width,
            stride=1 if avd else self.stride,
            groups=self.groups,
            radix=self.radix,
            reduction_factor=self.reduction_factor,
            dtype=self.dtype,
            norm_eval=self.norm_eval,
            name="conv2",
        )(out, train)
        if avd:
            # torch AvgPool2d(3, stride, padding=1) (resnest.py:216-218)
            out = nn.avg_pool(
                out, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
            )
        out = _conv(self.planes * 4, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn3")(out, train)
        if self.has_downsample:
            identity = _conv(self.planes * 4, 1, 1, name="downsample_conv",
                             dtype=self.dtype)(_avg_down(x, self.stride))
            identity = FrozenAwareBN(self.dtype, self.norm_eval, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    norm_eval: bool = True
    groups: int = 1  # unused (parity with Bottleneck signature)
    width: int = 0
    avg_down: bool = False
    quant: Optional[str] = None  # deploy-time int8 conv2 (see Bottleneck)
    qat: bool = False  # train-time STE fake-quant at the deploy scales

    @nn.compact
    def __call__(self, x, train: bool = False):
        qat = self.qat and train and self.quant is not None
        identity = x
        out = _conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        bn1 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")
        out = nn.relu(bn1(out, train))
        if self.quant in ("int8", "int8_conv2") and ((not train) or qat):
            s1 = _bn_act_scale(bn1)
            out = _q8_conv(self.planes, 3, 1, "conv2", qat=qat)(
                out if qat else quantize_int8(out, s1), s1, train=qat
            )
        else:
            out = _conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn2")(out, train)
        if self.has_downsample:
            ds_in = _avg_down(x, self.stride) if self.avg_down else x
            identity = _conv(self.planes, 1, 1 if self.avg_down else self.stride,
                             name="downsample_conv", dtype=self.dtype)(ds_in)
            identity = FrozenAwareBN(self.dtype, self.norm_eval, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


REGNET_ARCH = {
    # RegNetX quantized-linear width parameters
    # (reference models/backbones/regnet.py:65-82 arch_settings)
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22, bot_mul=1.0),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16, bot_mul=1.0),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18, bot_mul=1.0),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25, bot_mul=1.0),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23, bot_mul=1.0),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17, bot_mul=1.0),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23, bot_mul=1.0),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, bot_mul=1.0),
}


def regnet_stage_params(arch: dict, divisor: int = 8):
    """Per-stage (widths, blocks, bottleneck widths, groups) from RegNet
    parameters (reference regnet.py:221-311: generate_regnet +
    adjust_width_group + get_stages_from_blocks).

    Pure python/numpy — runs at module-construction (trace) time, so the
    network itself stays fully static for XLA.
    """
    import numpy as np

    w0, wa, wm, depth = arch["w0"], arch["wa"], arch["wm"], arch["depth"]
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = np.round(w0 * np.power(wm, ks) / divisor) * divisor
    widths = widths.astype(int).tolist()
    # contiguous equal-width runs become stages
    stage_widths, stage_blocks = [], []
    for w in widths:
        if stage_widths and stage_widths[-1] == w:
            stage_blocks[-1] += 1
        else:
            stage_widths.append(w)
            stage_blocks.append(1)
    bot_mul, group_w = arch["bot_mul"], arch["group_w"]
    bot_widths, groups, out_widths = [], [], []
    for w in stage_widths:
        wb = int(w * bot_mul)
        g = min(group_w, wb)
        wb = int(round(wb / g) * g)  # quantize to the group width
        bot_widths.append(wb)
        groups.append(wb // g)
        out_widths.append(int(wb / bot_mul))
    return out_widths, stage_blocks, bot_widths, groups


class RegNet(nn.Module):
    """RegNetX backbone (reference models/backbones/regnet.py).

    Differences from ResNet it inherits there: a bare 3x3/2 stem with NO
    maxpool (regnet.py:207-219), every stage strides 2 (strides=(2,2,2,2)),
    Bottleneck expansion 1 with per-stage widths/groups from the quantized
    linear width function.  Output strides are (4, 8, 16, 32), same as
    ResNet, so the FPN stacks on top unchanged.  mmcv checkpoints convert
    through the same layerX.Y naming (tools/convert_torch_weights.py).
    """

    arch: str = "regnetx_3.2gf"
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32
    stem_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = REGNET_ARCH[self.arch] if isinstance(self.arch, str) else dict(self.arch)
        stage_widths, stage_blocks, bot_widths, groups = regnet_stage_params(arch)

        x = x.astype(self.dtype)
        x = _conv(self.stem_channels, 3, 2, name="conv1", dtype=self.dtype)(x)
        x = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(x, train)
        x = nn.relu(x)
        if self.frozen_stages >= 0 and train:
            x = jax.lax.stop_gradient(x)

        outs = []
        channels = self.stem_channels
        for stage_idx, num_blocks in enumerate(stage_blocks):
            planes = stage_widths[stage_idx]
            for b in range(num_blocks):
                stride = 2 if b == 0 else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    has_downsample=(b == 0 and (stride != 1 or channels != planes)),
                    dtype=self.dtype,
                    norm_eval=self.norm_eval,
                    groups=groups[stage_idx],
                    width=bot_widths[stage_idx],
                    expansion=1,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train)
                channels = planes
            if self.frozen_stages >= stage_idx + 1 and train:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
        return tuple(outs)


class ResNet(nn.Module):
    """ResNet returning the feature maps selected by ``out_indices``.

    out_indices=(0,1,2,3) -> (C2, C3, C4, C5) at strides (4, 8, 16, 32).
    """

    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32
    groups: int = 1  # ResNeXt cardinality (e.g. 32 for x50_32x4d)
    base_width: int = 4  # ResNeXt width per group
    deep_stem: bool = False  # V1d: three 3x3 convs replace the 7x7 stem
    avg_down: bool = False  # V1d: AvgPool-based residual downsampling
    stem_s2d: bool = False  # space-to-depth stem (see StemConvS2D)
    scales: int = 1  # >1: Res2Net Bottle2neck (with base_width, e.g. 26)
    radix: int = 0  # >0: ResNeSt SplitAttentionBottleneck (typically 2)
    reduction_factor: int = 4  # ResNeSt gate squeeze factor
    avg_down_stride: bool = True  # ResNeSt: stride via 3x3 avg-pool
    # per-block gradient checkpointing (reference resnet.py:85-88 torch
    # cp.checkpoint): rematerialize block activations in backward — the
    # HBM-for-FLOPs lever for larger batches/inputs
    with_cp: bool = False
    # deploy-time int8 for the HBM-bound trunk convs (eval only unless qat,
    # param tree unchanged): conv2/conv3 of every block run int8 with static
    # frozen-BN-derived activation scales (see Bottleneck.quant /
    # ops/quant.py); 'int8_stream' additionally carries the residual stream
    # itself as int8 (plain-stem Bottleneck nets only)
    quant: Optional[str] = None
    # QAT: train-time STE fake-quant mirroring the deploy arithmetic at the
    # same static scales, so fine-tuning absorbs the quantization noise and
    # the int8-deployed weights lose no accuracy (ops/quant.py).
    qat: bool = False
    # TRAIN-time int8 for the FROZEN stages (beyond-reference option, off
    # by default; measured SLOWER than bf16 at the flagship recipe's batch
    # 16 — 46.8 vs 43.6 ms/step — because at train batch sizes the added
    # quantize/dequantize traffic outweighs the halved bytes.  Kept as a
    # tested option for truly bandwidth-saturated regimes; DESIGN.md 10/12).
    # The flagship recipe freezes stem+layer1
    # (frozen_stages=1) — exactly the stride-4 stages that are HBM-bound in
    # the forward (docs/DESIGN.md 9/10) — and freezing already means
    # "eval-mode modules + stop_gradient + masked optimizer" (the reference's
    # _freeze_stages calls m.eval(), resnet.py:573-584).  With
    # ``frozen_int8=True`` the frozen prefix runs the int8_stream DEPLOY
    # arithmetic during training: frozen BN gives valid static scales, the
    # stop_gradient boundary means no gradient ever traverses the rounding,
    # and the param tree is unchanged (Int8Conv mirrors _conv).  The first
    # trainable stage consumes the dequantized stream.  Feature noise is the
    # measured stream envelope (~2.7x bf16's own rounding,
    # tests/test_int8_deploy.py); eval runs the plain float path, and
    # tests/test_frozen_int8.py pins train-forward == int8_stream-deploy
    # equality on the frozen prefix.  Wired for the plain/ResNeXt Bottleneck
    # stem+trunk (same envelope as quant='int8_stream').
    frozen_int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stage_blocks = ARCH[self.depth]
        if self.qat:
            assert self.quant is not None and self.norm_eval, (
                "ResNet.qat needs a quant level and norm_eval=True (the "
                "static scales read frozen running stats)"
            )
        if self.quant is not None:
            assert self.quant in ("int8", "int8_conv2", "int8_stream"), (
                f"ResNet.quant: {self.quant!r}"
            )
            assert self.scales == 1 and self.radix == 0, (
                "int8 trunk quantization is implemented for the plain/"
                "ResNeXt Bottleneck and BasicBlock (the flagship deploy "
                "path); Res2Net/ResNeSt blocks are not wired"
            )
            if self.quant == "int8_stream":
                assert (block_kind == "bottleneck" and not self.deep_stem
                        and not self.avg_down), (
                    "int8_stream carries the residual stream as int8 and is "
                    "wired for the plain/ResNeXt Bottleneck stem+trunk only "
                    "(deep_stem/avg_down variants: use quant='int8')"
                )
        qat = self.qat and train and self.quant is not None
        q8_stream = self.quant == "int8_stream" and ((not train) or qat)
        # frozen-stage int8: active only while TRAINING a float config
        fi8 = self.frozen_int8 and train and self.frozen_stages >= 0
        if self.frozen_int8:
            assert self.quant is None and not self.qat, (
                "ResNet.frozen_int8 is the float-training lever; quant/qat "
                "configs already define their own quantized arithmetic"
            )
            assert (block_kind == "bottleneck" and not self.deep_stem
                    and not self.avg_down and self.scales == 1
                    and self.radix == 0), (
                "frozen_int8 reuses the int8_stream deploy path and is wired "
                "for the plain/ResNeXt Bottleneck stem+trunk only"
            )
            assert self.norm_eval, (
                "frozen_int8 derives static scales from frozen BN running "
                "stats (norm_eval=True required)"
            )
        block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
        expansion = 4 if block_kind == "bottleneck" else 1

        x = x.astype(self.dtype)
        if self.deep_stem:
            # mmcv ResNetV1d stem: 3x3/2 (32) -> 3x3 (32) -> 3x3 (64), each BN+ReLU
            for i, (feats, stride) in enumerate(((32, 2), (32, 1), (64, 1)), start=1):
                x = _conv(feats, 3, stride, name=f"stem_conv{i}", dtype=self.dtype)(x)
                x = FrozenAwareBN(self.dtype, self.norm_eval, name=f"stem_bn{i}")(x, train)
                x = nn.relu(x)
            stem_bn = None
        else:
            x = StemConvS2D(64, dtype=self.dtype, use_s2d=self.stem_s2d, name="conv1")(x)
            stem_bn = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")
            x = nn.relu(stem_bn(x, train))
        if (q8_stream and not qat) or fi8:
            # quantize in the stem BN+ReLU epilogue; maxpool runs on int8
            # (exact — max commutes with the monotone quantization)
            stream = _bn_affine_stats(stem_bn)
            x = quantize_int8(x, _stream_scale(stream))
            x = _max_pool_int8(x)
        elif q8_stream:
            # QAT: same grid in float (maxpool commutes with fake-quant)
            stream = _bn_affine_stats(stem_bn)
            x = fake_quant_ste(x, _stream_scale(stream))
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        else:
            stream = None
            # torch MaxPool2d(3, stride=2, padding=1): pad with -inf so the
            # pad never wins the max.
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if fi8 and self.frozen_stages == 0:
            # only the stem is frozen: hand layer1 the dequantized stream
            x = (x.astype(jnp.float32) * _stream_scale(stream)).astype(self.dtype)
            stream = None
        if self.frozen_stages >= 0 and train:
            x = jax.lax.stop_gradient(x)

        outs = []
        channels = 64
        for stage_idx, num_blocks in enumerate(stage_blocks):
            planes = 64 * (2 ** stage_idx)
            stride = 1 if stage_idx == 0 else 2
            # mmcv ResNeXt mid width: floor(planes * base_width/64) * groups
            width = ((planes * self.base_width // 64) * self.groups
                     if self.groups > 1 else 0)
            for b in range(num_blocks):
                common = dict(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0 and (stride != 1 or channels != planes * expansion)),
                    dtype=self.dtype,
                    norm_eval=self.norm_eval,
                    name=f"layer{stage_idx + 1}_{b}",
                )
                # static_argnums: (self, x, train) -> train must stay a
                # python bool through the remat trace
                remat = (
                    (lambda c: nn.remat(c, static_argnums=(2,)))
                    if self.with_cp
                    else (lambda c: c)
                )
                if self.radix > 0:
                    assert block_kind == "bottleneck", "ResNeSt needs depth>=50"
                    x = remat(SplitAttentionBottleneck)(
                        groups=self.groups,
                        base_width=self.base_width,
                        radix=self.radix,
                        reduction_factor=self.reduction_factor,
                        avg_down_stride=self.avg_down_stride,
                        **common,
                    )(x, train)
                elif self.scales > 1:
                    assert block_kind == "bottleneck", "Res2Net needs depth>=50"
                    x = remat(Bottle2neck)(
                        scales=self.scales, base_width=self.base_width, **common
                    )(x, train)
                elif q8_stream:
                    # stream-carrying block; remat still applies under QAT
                    # training (param names are identical either way —
                    # nn.remat preserves scopes)
                    x, stream = remat(Bottleneck)(
                        groups=self.groups, width=width, avg_down=self.avg_down,
                        quant=self.quant, qat=self.qat, **common,
                    )(x, train, stream)
                elif fi8 and stage_idx + 1 <= self.frozen_stages:
                    # frozen block: run it in EVAL mode with the int8_stream
                    # deploy arithmetic.  Freezing already means eval-mode
                    # modules (reference _freeze_stages), and with norm_eval
                    # the float paths are train/eval-identical — this branch
                    # only swaps in the deploy int8 ops, upstream of the
                    # stage-boundary stop_gradient.
                    x, stream = remat(Bottleneck)(
                        groups=self.groups, width=width, avg_down=False,
                        quant="int8_stream", qat=False, **common,
                    )(x, False, stream)
                else:
                    x = remat(block_cls)(
                        groups=self.groups, width=width, avg_down=self.avg_down,
                        quant=self.quant, qat=self.qat, **common,
                    )(x, train)
                channels = planes * expansion
            if fi8 and stage_idx + 1 == self.frozen_stages:
                # frozen/trainable boundary: the first trainable stage
                # consumes the dequantized stream (float from here on)
                x = (x.astype(jnp.float32) * _stream_scale(stream)).astype(self.dtype)
            if self.frozen_stages >= stage_idx + 1 and train:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                if (q8_stream and not qat) or (
                    fi8 and stage_idx + 1 < self.frozen_stages
                ):
                    # dequantize only the pyramid taps the neck consumes
                    # (start_level=1 leaves C2 dead — XLA removes it)
                    outs.append(
                        (x.astype(jnp.float32) * _stream_scale(stream)).astype(self.dtype)
                    )
                else:
                    outs.append(x.astype(self.dtype) if q8_stream else x)
        return tuple(outs)
