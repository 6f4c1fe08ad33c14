"""The reference's remaining registered backbone families (flax, NHWC).

Closes the last backbone rows of SURVEY.md §2.2: Darknet-53
(/root/reference/radet/models/backbones/darknet.py), HRNet (hrnet.py),
SSD-VGG (ssd_vgg.py), HourglassNet (hourglass.py), DetectoRS ResNet with
Switchable Atrous Convolution (detectors_resnet.py + mmcv ConvAWS2d/SAConv2d
semantics), and TridentResNet (trident_resnet.py).  Like the rest of the
model zoo these are re-designs, not ports: NHWC layouts, explicit-numeric
padding matching torch conv arithmetic (for checkpoint-import parity),
static python structure so XLA sees one fused graph, grouped/dilated convs
lowered straight onto the MXU.

Composition notes (documented in docs/PARITY.md): Darknet/HRNet/
DetectoRS-ResNet compose with the shipped FPN (strides land on the RADet
anchor levels); SSD-VGG composes with ChannelMapper; HourglassNet (stride-4
repeated outputs, CenterNet-style) and TridentResNet (batch-concatenated
trident branches, Faster-RCNN-style) have no reference-shipped neck/head
that can consume them — the reference registers them equally unused — so
they are exposed as standalone modules with torch parity tests.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ARCH, BasicBlock, Bottleneck, FrozenAwareBN, _conv

Dtype = Any


# ---------------------------------------------------------------------------
# config canonicalization: nested dicts/lists -> hashable tuples so they can
# live on (frozen-dataclass) flax module fields; `thaw_cfg` restores dicts.
# ---------------------------------------------------------------------------

def freeze_cfg(obj):
    if isinstance(obj, dict):
        return ("__dict__",) + tuple(
            (k, freeze_cfg(v)) for k, v in sorted(obj.items())
        )
    if isinstance(obj, (list, tuple)):
        return ("__seq__",) + tuple(freeze_cfg(v) for v in obj)
    return obj


def thaw_cfg(obj):
    if isinstance(obj, tuple) and obj and obj[0] == "__dict__":
        return {k: thaw_cfg(v) for k, v in obj[1:]}
    if isinstance(obj, tuple) and obj and obj[0] == "__seq__":
        return tuple(thaw_cfg(v) for v in obj[1:])
    return obj


def _conv_bias(features, kernel, stride=1, pad=None, dilation=1, name=None,
               dtype=jnp.float32):
    """Conv WITH bias (VGG/extra/switch convs), explicit numeric padding."""
    if pad is None:
        pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _maxpool_ceil(x, kernel, stride):
    """torch MaxPool2d(kernel, stride, ceil_mode=True): pad bottom/right with
    -inf so padded cells never win."""
    _, h, w, _ = x.shape
    ph = (-(h - kernel)) % stride if h > kernel else kernel - h
    pw = (-(w - kernel)) % stride if w > kernel else kernel - w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (kernel, kernel), strides=(stride, stride), padding="VALID")


def _upsample_nearest(x, factor):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


# ---------------------------------------------------------------------------
# Darknet-53 (reference darknet.py)
# ---------------------------------------------------------------------------

DARKNET_ARCH = {
    # (res-block repeats per stage, (in, out) channels per stage)
    53: ((1, 2, 8, 8, 4), ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))),
}


class Darknet(nn.Module):
    """Darknet-53 (reference darknet.py:56-199): 3x3 stem, five stages of
    [3x3/2 conv + n x (1x1 half -> 3x3 full residual)], every conv
    BN+LeakyReLU(0.1).  out_indices index the [stem, stage1..stage5] list —
    the reference default (3, 4, 5) yields C3/C4/C5 at strides 8/16/32,
    which the FPN turns into the RADet anchor levels."""

    depth: int = 53
    out_indices: Tuple[int, ...] = (3, 4, 5)
    frozen_stages: int = -1  # freeze the first N entries of that same list
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers, channels = DARKNET_ARCH[self.depth]

        def conv_bn_leaky(y, feats, k, stride, cname, bname):
            y = _conv(feats, k, stride, name=cname, dtype=self.dtype)(y)
            y = FrozenAwareBN(self.dtype, self.norm_eval, name=bname)(y, train)
            return nn.leaky_relu(y, negative_slope=0.1)

        x = x.astype(self.dtype)
        x = conv_bn_leaky(x, 32, 3, 1, "conv1", "bn1")
        if self.frozen_stages >= 1 and train:
            x = jax.lax.stop_gradient(x)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for i, n_res in enumerate(layers, start=1):
            _, out_c = channels[i - 1]
            x = conv_bn_leaky(x, out_c, 3, 2, f"crb{i}_conv", f"crb{i}_bn")
            for j in range(n_res):
                residual = x
                y = conv_bn_leaky(x, out_c // 2, 1, 1,
                                  f"crb{i}_res{j}_conv1", f"crb{i}_res{j}_bn1")
                y = conv_bn_leaky(y, out_c, 3, 1,
                                  f"crb{i}_res{j}_conv2", f"crb{i}_res{j}_bn2")
                x = y + residual
            if self.frozen_stages >= i + 1 and train:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


# ---------------------------------------------------------------------------
# HRNet (reference hrnet.py)
# ---------------------------------------------------------------------------

HRNET_W18 = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=(18, 36)),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=(18, 36, 72, 144)),
)

HRNET_W32 = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=(32, 64)),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 144 * 2)),
)

HRNET_PRESETS = {"hrnet_w18": HRNET_W18, "hrnet_w32": HRNET_W32}


class HRNet(nn.Module):
    """HRNet (reference hrnet.py:198-537): two 3x3/2 stem convs, a
    Bottleneck stage-1, then parallel multi-resolution branches exchanged by
    fuse layers inside each HRModule.  Returns one map per branch at strides
    (4, 8, 16, 32) — FPN(start_level=1) puts the RADet levels on 8..128.

    The fuse upsample transcribes the reference's
    ``nn.Upsample(scale_factor=2**(j-i), mode='nearest')`` (hrnet.py:138-139)
    as repeat-then-crop — identical whenever the branch sizes divide evenly
    (the reference version requires that; odd sizes additionally work here).
    The reference quirk of feeding ``y_list[-1]`` to every non-None
    transition (hrnet.py:511-524) is preserved — it only matters for the
    newly-created branch, the case real checkpoints exercise.

    ``extra`` is the canonicalized (freeze_cfg) stage spec or a preset name.
    """

    extra: Any = "hrnet_w18"
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    def _cfg(self):
        if isinstance(self.extra, str):
            return HRNET_PRESETS[self.extra]
        return {k: dict(v) for k, v in thaw_cfg(self.extra).items()}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self._cfg()

        def conv_bn(y, feats, k, stride, cname, bname, relu=True):
            y = _conv(feats, k, stride, name=cname, dtype=self.dtype)(y)
            y = FrozenAwareBN(self.dtype, self.norm_eval, name=bname)(y, train)
            return nn.relu(y) if relu else y

        x = x.astype(self.dtype)
        x = conv_bn(x, 64, 3, 2, "conv1", "bn1")
        x = conv_bn(x, 64, 3, 2, "conv2", "bn2")

        # stage 1: Bottleneck layer (expansion 4)
        s1 = cfg["stage1"]
        assert s1["block"] == "BOTTLENECK"
        planes = s1["num_channels"][0]
        in_c = 64
        for b in range(s1["num_blocks"][0]):
            x = Bottleneck(
                planes=planes,
                stride=1,
                has_downsample=(b == 0 and in_c != planes * 4),
                dtype=self.dtype,
                norm_eval=self.norm_eval,
                name=f"layer1_{b}",
            )(x, train)
            in_c = planes * 4
        pre_channels = [in_c]

        y_list = [x]
        for stage_idx in (2, 3, 4):
            scfg = cfg[f"stage{stage_idx}"]
            assert scfg["block"] == "BASIC", "post-stage1 HRNet blocks are BASIC"
            num_br = scfg["num_branches"]
            cur_channels = list(scfg["num_channels"])  # BasicBlock expansion 1

            # transition (reference _make_transition_layer + forward quirk:
            # any non-None transition consumes y_list[-1])
            x_list = []
            t = stage_idx - 1
            for i in range(num_br):
                if i < len(pre_channels):
                    if cur_channels[i] != pre_channels[i]:
                        y = conv_bn(y_list[-1], cur_channels[i], 3, 1,
                                    f"transition{t}_{i}_conv", f"transition{t}_{i}_bn")
                    else:
                        y = y_list[i]
                else:
                    y = y_list[-1]
                    for j in range(i + 1 - len(pre_channels)):
                        out_c = (cur_channels[i]
                                 if j == i - len(pre_channels)
                                 else pre_channels[-1])
                        y = conv_bn(y, out_c, 3, 2,
                                    f"transition{t}_{i}_{j}_conv",
                                    f"transition{t}_{i}_{j}_bn")
                x_list.append(y)

            # num_modules HRModules
            for m in range(scfg["num_modules"]):
                pfx = f"s{stage_idx}m{m}"
                # branches
                for br in range(num_br):
                    y = x_list[br]
                    c_in = y.shape[-1]
                    for blk in range(scfg["num_blocks"][br]):
                        y = BasicBlock(
                            planes=cur_channels[br],
                            stride=1,
                            has_downsample=(blk == 0 and c_in != cur_channels[br]),
                            dtype=self.dtype,
                            norm_eval=self.norm_eval,
                            name=f"{pfx}_branch{br}_block{blk}",
                        )(y, train)
                        c_in = cur_channels[br]
                    x_list[br] = y
                # fuse
                fused = []
                for i in range(num_br):
                    acc = x_list[i]
                    for j in range(num_br):
                        if j == i:
                            continue
                        if j > i:
                            y = conv_bn(x_list[j], cur_channels[i], 1, 1,
                                        f"{pfx}_fuse{i}_{j}_conv",
                                        f"{pfx}_fuse{i}_{j}_bn", relu=False)
                            y = _upsample_nearest(y, 2 ** (j - i))
                            y = y[:, : acc.shape[1], : acc.shape[2], :]
                        else:
                            y = x_list[j]
                            for k in range(i - j):
                                last = k == i - j - 1
                                out_c = cur_channels[i] if last else cur_channels[j]
                                y = conv_bn(y, out_c, 3, 2,
                                            f"{pfx}_fuse{i}_{j}_{k}_conv",
                                            f"{pfx}_fuse{i}_{j}_{k}_bn",
                                            relu=not last)
                        acc = acc + y
                    fused.append(nn.relu(acc))
                x_list = fused

            y_list = x_list
            pre_channels = cur_channels

        return tuple(y_list)


# ---------------------------------------------------------------------------
# SSD-VGG (reference ssd_vgg.py + mmcv.cnn.VGG)
# ---------------------------------------------------------------------------

VGG_STAGE_CONVS = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2),
                   16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}
VGG_STAGE_CHANNELS = (64, 128, 256, 512, 512)
SSD_EXTRA_SETTING = {
    300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
    512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256, 128),
}


def vgg_feature_layout(depth: int, with_last_pool: bool = False):
    """The mmcv VGG ``features`` index layout (conv/relu/pool sequence) plus
    the SSD additions (ssd_vgg.py:55-66), so flax module names carry the
    exact torch ``features.{i}`` indices for checkpoint conversion."""
    layout = []  # (kind, ...) tuples; index in list == torch index
    for stage, n_convs in enumerate(VGG_STAGE_CONVS[depth]):
        for _ in range(n_convs):
            layout.append(("conv", VGG_STAGE_CHANNELS[stage], 3, 1, 1))  # c,k,pad,dil
            layout.append(("relu",))
        layout.append(("pool", 2, 2, True))  # k, stride, ceil
    if not with_last_pool:
        layout.pop()
    # SSD additions: pool3s1p1, conv6 (1024, 3x3, pad 6, dil 6), relu,
    # conv7 (1024, 1x1), relu
    layout.append(("pool", 3, 1, False))  # stride 1, pad 1 (handled below)
    layout.append(("conv", 1024, 3, 6, 6))
    layout.append(("relu",))
    layout.append(("conv", 1024, 1, 0, 1))
    layout.append(("relu",))
    return layout


def ssd_extra_layout(input_size: int):
    """(out_c, kernel, stride, pad) per extra conv (ssd_vgg.py:119-143).

    The reference builds a conv at every entry, with 'S' entries becoming
    stride-2 convs outputting the NEXT entry's channels (that next entry is
    then consumed as the in-channel restore, not a conv); kernel alternates
    1/3 by build order."""
    planes = SSD_EXTRA_SETTING[input_size]
    layers = []
    num_layers = 0
    skip = False
    for i in range(len(planes)):
        if skip:
            skip = False
            continue
        k = (1, 3)[num_layers % 2]
        if planes[i] == "S":
            layers.append((planes[i + 1], k, 2, 1))
            skip = True
        else:
            layers.append((planes[i], k, 1, 0))
        num_layers += 1
    if input_size == 512:
        layers.append((256, 4, 1, 1))
    return layers


class SSDVGG(nn.Module):
    """VGG-16 SSD backbone (reference ssd_vgg.py:12-143): mmcv VGG features
    with ceil-mode pools and no final pool, dilation-6 conv6 + 1x1 conv7,
    SSD extra convs (output after every second one), L2Norm on the first
    out.  VGG convs carry biases and no BN (the torchvision-pretrained
    layout the reference loads)."""

    input_size: int = 300
    depth: int = 16
    out_feature_indices: Tuple[int, ...] = (22, 34)
    l2_norm_scale: float = 20.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN anywhere in SSD-VGG
        x = x.astype(self.dtype)
        outs = []
        for idx, spec in enumerate(vgg_feature_layout(self.depth)):
            if spec[0] == "conv":
                _, c, k, pad, dil = spec
                x = _conv_bias(c, k, 1, pad=pad, dilation=dil,
                               name=f"features_{idx}", dtype=self.dtype)(x)
            elif spec[0] == "relu":
                x = nn.relu(x)
            else:
                _, k, stride, ceil = spec
                if ceil:
                    x = _maxpool_ceil(x, k, stride)
                else:  # the SSD pool: k3 s1 pad1
                    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf)
                    x = nn.max_pool(x, (k, k), strides=(stride, stride),
                                    padding="VALID")
            if idx in self.out_feature_indices:
                outs.append(x)
        for i, (c, k, stride, pad) in enumerate(ssd_extra_layout(self.input_size)):
            x = nn.relu(_conv_bias(c, k, stride, pad=pad,
                                   name=f"extra_{i}", dtype=self.dtype)(x))
            if i % 2 == 1:
                outs.append(x)
        # L2Norm on conv4_3's output (ssd_vgg.py:146-169), fp32 math
        w = self.param("l2_norm_weight",
                       nn.initializers.constant(self.l2_norm_scale),
                       (outs[0].shape[-1],), jnp.float32)
        x0 = outs[0].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x0 * x0, axis=-1, keepdims=True)) + 1e-10
        outs[0] = (w * x0 / norm).astype(outs[0].dtype)
        return tuple(outs)


# ---------------------------------------------------------------------------
# HourglassNet (reference hourglass.py)
# ---------------------------------------------------------------------------


class HourglassModule(nn.Module):
    """One recursive hourglass (reference hourglass.py:9-77): up1 keeps the
    resolution, low1 strides down, low2 recurses (or bottoms out in a
    ResLayer), low3 maps back to the outer width with the channel change in
    its LAST block (mmdet ResLayer downsample_first=False), up2 is a nearest
    2x upsample added to up1."""

    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    def _res_layer(self, x, in_c, out_c, blocks, stride, prefix,
                   downsample_first, train):
        if downsample_first:
            for b in range(blocks):
                x = BasicBlock(
                    planes=out_c,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0 and (stride != 1 or in_c != out_c)),
                    dtype=self.dtype, norm_eval=self.norm_eval,
                    name=f"{prefix}_{b}",
                )(x, train)
                in_c = out_c
        else:  # channel change in the last block (hourglass low3)
            for b in range(blocks):
                last = b == blocks - 1
                planes = out_c if last else in_c
                x = BasicBlock(
                    planes=planes,
                    stride=1,
                    has_downsample=(last and in_c != out_c),
                    dtype=self.dtype, norm_eval=self.norm_eval,
                    name=f"{prefix}_{b}",
                )(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = self._res_layer(x, cur_c, cur_c, cur_b, 1, "up1", True, train)
        low1 = self._res_layer(x, cur_c, next_c, cur_b, 2, "low1", True, train)
        if self.depth > 1:
            low2 = HourglassModule(
                depth=self.depth - 1,
                stage_channels=self.stage_channels[1:],
                stage_blocks=self.stage_blocks[1:],
                norm_eval=self.norm_eval, dtype=self.dtype, name="low2",
            )(low1, train)
        else:
            low2 = self._res_layer(low1, next_c, next_c, next_b, 1, "low2",
                                   True, train)
        low3 = self._res_layer(low2, next_c, cur_c, cur_b, 1, "low3", False, train)
        up2 = _upsample_nearest(low3, 2)[:, : up1.shape[1], : up1.shape[2], :]
        return up1 + up2


class HourglassNet(nn.Module):
    """Stacked hourglass (reference hourglass.py:81-198): 7x7/2 conv +
    stride-2 res stem (stride 4 total), ``num_stacks`` hourglasses with
    inter-stack 1x1 remap/merge, per-stack 3x3 out convs.  Outputs
    ``num_stacks`` maps at stride 4 — the CenterNet contract; no
    reference-shipped neck/head consumes it (documented descope)."""

    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c = self.stage_channels[0]

        def conv_bn_relu(y, feats, k, stride, name, relu=True):
            # mmcv ConvModule with a norm layer drops the conv bias
            y = _conv(feats, k, stride, name=f"{name}_conv", dtype=self.dtype)(y)
            y = FrozenAwareBN(self.dtype, self.norm_eval,
                              name=f"{name}_bn")(y, train)
            return nn.relu(y) if relu else y

        x = x.astype(self.dtype)
        x = conv_bn_relu(x, 128, 7, 2, "stem")
        x = BasicBlock(planes=cur_c, stride=2, has_downsample=True,
                       dtype=self.dtype, norm_eval=self.norm_eval,
                       name="stem_res0")(x, train)

        out_feats = []
        inter = x
        for ind in range(self.num_stacks):
            hg = HourglassModule(
                depth=self.downsample_times,
                stage_channels=self.stage_channels,
                stage_blocks=self.stage_blocks,
                norm_eval=self.norm_eval, dtype=self.dtype, name=f"hg{ind}",
            )(inter, train)
            out = conv_bn_relu(hg, self.feat_channel, 3, 1, f"out_conv{ind}")
            out_feats.append(out)
            if ind < self.num_stacks - 1:
                a = conv_bn_relu(inter, cur_c, 1, 1, f"conv1x1_{ind}", relu=False)
                b = conv_bn_relu(out, cur_c, 1, 1, f"remap{ind}", relu=False)
                inter = nn.relu(a + b)
                inter = BasicBlock(planes=cur_c, stride=1, has_downsample=False,
                                   dtype=self.dtype, norm_eval=self.norm_eval,
                                   name=f"inter{ind}")(inter, train)
        return tuple(out_feats)


# ---------------------------------------------------------------------------
# DetectoRS: SAC (mmcv ConvAWS2d/SAConv2d) + DetectoRS_ResNet
# ---------------------------------------------------------------------------


class SAConv(nn.Module):
    """Switchable Atrous Convolution (DetectoRS, arXiv 2006.02334 §4;
    mmcv 1.3.18 SAConv2d/ConvAWS2d semantics, referenced from
    detectors_resnet.py:40-48).

    Weight standardization (AWS): per-output-channel (w - mean)/sqrt(var+1e-5)
    (unbiased var, torch default) scaled by learnable gamma/beta.  Forward:
    global-avg pre-context add -> switch = 1x1(avg5x5(reflect-pad-2 x)) ->
    out = switch * conv(w, d) + (1-switch) * conv(w + weight_diff, 3d)
    -> global-avg post-context add.  The two dilated convs are independent
    MXU ops XLA schedules back-to-back; everything else fuses.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1  # DetectoRS_ResNeXt grouped SAC (detectors_resnext.py:53)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        k = self.kernel
        wshape = (k, k, in_c // self.groups, self.features)
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            wshape, jnp.float32,
        )
        weight_diff = self.param("weight_diff", nn.initializers.zeros,
                                 wshape, jnp.float32)
        gamma = self.param("weight_gamma", nn.initializers.ones,
                           (self.features,), jnp.float32)
        beta = self.param("weight_beta", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        # AWS standardization over (k, k, in/groups) per output channel
        n = k * k * (in_c // self.groups)
        mean = jnp.mean(weight, axis=(0, 1, 2), keepdims=True)
        var = jnp.sum((weight - mean) ** 2, axis=(0, 1, 2), keepdims=True) / (n - 1)
        w_std = (weight - mean) / jnp.sqrt(var + 1e-5)
        w_std = gamma * w_std + beta

        # pre-context: global average, 1x1, broadcast-add
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + _conv_bias(in_c, 1, 1, name="pre_context",
                           dtype=self.dtype)(avg)

        # switch: reflect-pad 2, 5x5 mean, 1x1 conv at the conv stride
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        avg5 = nn.avg_pool(xp, (5, 5), strides=(1, 1), padding="VALID")
        switch = _conv_bias(1, 1, self.stride, pad=0, name="switch",
                            dtype=self.dtype)(avg5)

        def dilated(w, d):
            pad = d * (k - 1) // 2
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                (self.stride, self.stride), ((pad, pad), (pad, pad)),
                rhs_dilation=(d, d),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out_s = dilated(w_std, self.dilation)
        out_l = dilated(w_std + weight_diff, 3 * self.dilation)
        out = switch * out_s + (1 - switch) * out_l

        avg_out = jnp.mean(out, axis=(1, 2), keepdims=True)
        return out + _conv_bias(self.features, 1, 1, name="post_context",
                                dtype=self.dtype)(avg_out)


class DetectoRSBottleneck(nn.Module):
    """DetectoRS bottleneck (detectors_resnet.py:10-110): plain ResNet
    bottleneck whose 3x3 is a SAC conv when ``sac`` is set, plus an optional
    zero-init 1x1 ``rfp_conv`` adding the recursive-feature-pyramid feed
    before the final ReLU."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    sac: bool = False
    rfp_inplanes: int = 0  # >0: this block carries an rfp_conv
    width: int = 0  # mid channels; 0 -> planes (DetectoRS_ResNeXt sets it)
    groups: int = 1  # ResNeXt cardinality (detectors_resnext.py:28-34)
    dtype: Dtype = jnp.float32
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, rfp_feat=None, train: bool = False):
        width = self.width or self.planes
        identity = x
        out = _conv(width, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(out, train)
        out = nn.relu(out)
        if self.sac:
            out = SAConv(width, 3, self.stride, groups=self.groups,
                         dtype=self.dtype, name="conv2")(out)
        else:
            out = _conv(width, 3, self.stride, name="conv2",
                        dtype=self.dtype, groups=self.groups)(out)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenAwareBN(self.dtype, self.norm_eval, name="bn3")(out, train)
        if self.has_downsample:
            identity = _conv(self.planes * 4, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenAwareBN(self.dtype, self.norm_eval,
                                     name="downsample_bn")(identity, train)
        out = out + identity
        if self.rfp_inplanes > 0:
            rfp_out = _conv_bias(self.planes * 4, 1, 1, name="rfp_conv",
                                 dtype=self.dtype)
            if rfp_feat is not None:
                out = out + rfp_out(rfp_feat)
            else:
                # keep the parameter in the tree even on the plain forward;
                # the dummy input must carry rfp_inplanes channels so the
                # kernel shape matches the rfp path (checkpoint layout)
                dummy = jnp.zeros(out.shape[:3] + (self.rfp_inplanes,), out.dtype)
                out = out + 0.0 * rfp_out(dummy)
        return nn.relu(out)


class DetectoRSResNet(nn.Module):
    """DetectoRS ResNet (detectors_resnet.py:204-305): standard ResNet stem
    and stages, SAC 3x3s on the stages selected by ``stage_with_sac``,
    optional per-stage RFP input convs (first block of stages 2..4), and
    ``output_img`` prepending the raw image (the RFP neck contract).

    Without RFP feats this composes with the shipped FPN exactly like
    ResNet (strides 4/8/16/32); ``__call__(x, rfp_feats=...)`` is the
    rfp_forward equivalent for a recursive pyramid built on top.
    """

    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    stage_with_sac: Tuple[bool, ...] = (False, False, False, False)
    rfp_inplanes: int = 0  # >0: stages 2..4 first blocks take rfp feats
    output_img: bool = False
    groups: int = 1  # >1: DetectoRS_ResNeXt (grouped bottlenecks + SAC)
    base_width: int = 4
    frozen_stages: int = 1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rfp_feats=None, train: bool = False):
        kind, stage_blocks = ARCH[self.depth]
        assert kind == "bottleneck", "DetectoRS needs depth >= 50"
        img = x
        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if self.frozen_stages >= 0 and train:
            x = jax.lax.stop_gradient(x)

        outs = [img] if self.output_img else []
        channels = 64
        for stage_idx, num_blocks in enumerate(stage_blocks):
            planes = 64 * (2 ** stage_idx)
            stride = 1 if stage_idx == 0 else 2
            rfp_here = self.rfp_inplanes > 0 and stage_idx > 0
            rfp_feat = (rfp_feats[stage_idx] if (rfp_feats is not None and rfp_here)
                        else None)
            for b in range(num_blocks):
                # ResNeXt width rule (detectors_resnext.py:28-34)
                width = ((planes * self.base_width // 64) * self.groups
                         if self.groups > 1 else 0)
                x = DetectoRSBottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0 and (stride != 1 or channels != planes * 4)),
                    sac=self.stage_with_sac[stage_idx],
                    rfp_inplanes=(self.rfp_inplanes if (rfp_here and b == 0) else 0),
                    width=width,
                    groups=self.groups,
                    dtype=self.dtype,
                    norm_eval=self.norm_eval,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, rfp_feat if b == 0 else None, train)
                channels = planes * 4
            if self.frozen_stages >= stage_idx + 1 and train:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
        return tuple(outs)


# ---------------------------------------------------------------------------
# TridentResNet (reference trident_resnet.py)
# ---------------------------------------------------------------------------


class TridentBottleneck(nn.Module):
    """Trident bottleneck (trident_resnet.py:92-173): the 3x3 kernel is ONE
    shared parameter applied per branch with dilations (1, 2, 3); branch
    count is 3 in training / ``test_branch_idx``-selected single branch at
    inference.  The final block of the stage concatenates branches along
    the batch axis (the reference's scale-aware batch trick)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    concat_output: bool = False
    dtype: Dtype = jnp.float32
    norm_eval: bool = True

    @nn.compact
    def __call__(self, branches, train: bool = False):
        if not isinstance(branches, (list, tuple)):
            dils = (self.trident_dilations if (train or self.test_branch_idx < 0)
                    else (self.trident_dilations[self.test_branch_idx],))
            branches = [branches] * len(dils)
        else:
            dils = (self.trident_dilations if (train or self.test_branch_idx < 0)
                    else (self.trident_dilations[self.test_branch_idx],))
            assert len(branches) == len(dils)

        conv1 = _conv(self.planes, 1, 1, name="conv1", dtype=self.dtype)
        bn1 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")
        kernel = self.param(
            "conv2_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, self.planes, self.planes), jnp.float32,
        )
        bn2 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn2")
        conv3 = _conv(self.planes * 4, 1, 1, name="conv3", dtype=self.dtype)
        bn3 = FrozenAwareBN(self.dtype, self.norm_eval, name="bn3")
        ds_conv = (_conv(self.planes * 4, 1, self.stride, name="downsample_conv",
                         dtype=self.dtype) if self.has_downsample else None)
        ds_bn = (FrozenAwareBN(self.dtype, self.norm_eval, name="downsample_bn")
                 if self.has_downsample else None)

        outs = []
        for b, d in zip(branches, dils):
            identity = ds_bn(ds_conv(b), train) if self.has_downsample else b
            y = nn.relu(bn1(conv1(b), train))
            y = jax.lax.conv_general_dilated(
                y.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride, self.stride), ((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.relu(bn2(y, train))
            y = bn3(conv3(y), train)
            outs.append(nn.relu(y + identity))
        if self.concat_output:
            return jnp.concatenate(outs, axis=0)
        return outs


class TridentResNet(nn.Module):
    """TridentResNet (trident_resnet.py:229-292): ResNet stem + stages 1-2,
    then a trident stage 3 whose blocks share weights across three dilated
    branches; the stage output is branch-concatenated along batch.  The
    reference pairs it with TridentFasterRCNN machinery it does not ship —
    standalone capability module (documented descope)."""

    depth: int = 50
    test_branch_idx: int = 1
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = ARCH[self.depth]
        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = FrozenAwareBN(self.dtype, self.norm_eval, name="bn1")(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if self.frozen_stages >= 0 and train:
            x = jax.lax.stop_gradient(x)

        channels = 64
        for stage_idx in (0, 1):
            planes = 64 * (2 ** stage_idx)
            stride = 1 if stage_idx == 0 else 2
            for b in range(stage_blocks[stage_idx]):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0 and (stride != 1 or channels != planes * 4)),
                    dtype=self.dtype, norm_eval=self.norm_eval,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train)
                channels = planes * 4
            if self.frozen_stages >= stage_idx + 1 and train:
                x = jax.lax.stop_gradient(x)

        planes = 256
        n = stage_blocks[2]
        for b in range(n):
            x = TridentBottleneck(
                planes=planes,
                stride=2 if b == 0 else 1,
                has_downsample=(b == 0),
                trident_dilations=self.trident_dilations,
                test_branch_idx=self.test_branch_idx,
                concat_output=(b == n - 1),
                dtype=self.dtype, norm_eval=self.norm_eval,
                name=f"layer3_{b}",
            )(x, train)
        return (x,)


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------

def make_backbone(btype: str, opts: dict, norm_eval: bool, frozen_stages: int,
                  dtype, name: str = "backbone") -> nn.Module:
    """Instantiate one of the extra backbone families from a reference-style
    config dict (the keys each reference class accepts)."""
    opts = dict(opts)
    if btype == "Darknet":
        return Darknet(
            depth=opts.get("depth", 53),
            out_indices=tuple(opts.get("out_indices", (3, 4, 5))),
            frozen_stages=frozen_stages,
            norm_eval=norm_eval, dtype=dtype, name=name,
        )
    if btype == "HRNet":
        extra = opts.get("extra", "hrnet_w18")
        if isinstance(extra, dict):
            extra = freeze_cfg(extra)
        return HRNet(extra=extra, norm_eval=norm_eval, dtype=dtype, name=name)
    if btype == "SSDVGG":
        return SSDVGG(
            input_size=opts.get("input_size", 300),
            depth=opts.get("depth", 16),
            out_feature_indices=tuple(opts.get("out_feature_indices", (22, 34))),
            l2_norm_scale=opts.get("l2_norm_scale", 20.0),
            dtype=dtype, name=name,
        )
    if btype in ("DetectoRS_ResNet", "DetectoRS_ResNeXt"):
        sac = opts.get("sac")
        default_sac = ((False, True, True, True) if sac is not None
                       else (False, False, False, False))
        xt = btype == "DetectoRS_ResNeXt"
        return DetectoRSResNet(
            depth=opts.get("depth", 50),
            out_indices=tuple(opts.get("out_indices", (0, 1, 2, 3))),
            stage_with_sac=tuple(opts.get("stage_with_sac", default_sac)),
            rfp_inplanes=opts.get("rfp_inplanes") or 0,
            output_img=opts.get("output_img", False),
            groups=opts.get("groups", 32 if xt else 1),
            base_width=opts.get("base_width", 4),
            frozen_stages=frozen_stages,
            norm_eval=norm_eval, dtype=dtype, name=name,
        )
    if btype == "HourglassNet":
        return HourglassNet(
            downsample_times=opts.get("downsample_times", 5),
            num_stacks=opts.get("num_stacks", 2),
            stage_channels=tuple(opts.get("stage_channels",
                                          (256, 256, 384, 384, 384, 512))),
            stage_blocks=tuple(opts.get("stage_blocks", (2, 2, 2, 2, 2, 4))),
            feat_channel=opts.get("feat_channel", 256),
            norm_eval=norm_eval, dtype=dtype, name=name,
        )
    if btype == "TridentResNet":
        return TridentResNet(
            depth=opts.get("depth", 50),
            test_branch_idx=opts.get("test_branch_idx", 1),
            trident_dilations=tuple(opts.get("trident_dilations", (1, 2, 3))),
            frozen_stages=frozen_stages,
            norm_eval=norm_eval, dtype=dtype, name=name,
        )
    raise ValueError(f"unknown extra backbone type {btype!r}")
