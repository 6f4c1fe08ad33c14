"""Backbone-variant parity: ResNetV1d (deep stem + avg_down) and ResNeXt
(grouped bottleneck) against torch transcriptions of the mmcv layouts
(/root/reference/radet/models/backbones/resnet.py ResNetV1d, resnext.py
ResNeXt), converted through tools/convert_torch_weights.

Odd spatial sizes are used so the ceil-mode / count_include_pad=False
semantics of the avg_down pool are exercised, not just the even fast path.
"""

import sys
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
from convert_torch_weights import convert_resnet  # noqa: E402


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.randn(m.num_features) * 0.5, dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.rand(m.num_features) + 0.5, dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.2 + 1, dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.1, dtype=torch.float32))


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchBottleneckX(tnn.Module):
    """Bottleneck with optional ResNeXt grouping (mmcv resnext.py width rule)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=4):
        super().__init__()
        width = (planes * base_width // 64) * groups if groups > 1 else planes
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1, groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchBottle2neck(tnn.Module):
    """mmcv Res2Net Bottle2neck transcription (reference res2net.py:17-163)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None, scales=4, base_width=26):
        super().__init__()
        width = planes * base_width // 64
        self.width, self.scales = width, scales
        self.stage = downsample is not None
        self.conv1 = tnn.Conv2d(inplanes, width * scales, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width * scales)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
             for _ in range(scales - 1)]
        )
        self.bns = tnn.ModuleList([tnn.BatchNorm2d(width) for _ in range(scales - 1)])
        self.pool = tnn.AvgPool2d(3, stride=stride, padding=1) if (self.stage and stride != 1) else None
        self.conv3 = tnn.Conv2d(width * scales, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        spx = torch.split(out, self.width, 1)
        sp = self.relu(self.bns[0](self.convs[0](spx[0])))
        cat = sp
        for i in range(1, self.scales - 1):
            sp_in = spx[i] if self.stage else sp + spx[i]
            sp = self.relu(self.bns[i](self.convs[i](sp_in)))
            cat = torch.cat((cat, sp), 1)
        last = self.pool(spx[-1]) if self.pool is not None else spx[-1]
        out = self.bn3(self.conv3(torch.cat((cat, last), 1)))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchSplAtConv(tnn.Module):
    """mmcv SplitAttentionConv2d transcription (reference resnest.py:39-147)."""

    def __init__(self, width, stride=1, groups=1, radix=2, reduction_factor=4):
        super().__init__()
        inter = max(width * radix // reduction_factor, 32)
        self.width, self.groups, self.radix = width, groups, radix
        self.conv = tnn.Conv2d(width, width * radix, 3, stride=stride, padding=1,
                               groups=groups * radix, bias=False)
        self.bn0 = tnn.BatchNorm2d(width * radix)
        self.fc1 = tnn.Conv2d(width, inter, 1, groups=groups)
        self.bn1 = tnn.BatchNorm2d(inter)
        self.fc2 = tnn.Conv2d(inter, width * radix, 1, groups=groups)
        self.relu = tnn.ReLU()

    def forward(self, x):
        import torch.nn.functional as F

        x = self.relu(self.bn0(self.conv(x)))
        b = x.size(0)
        splits = x.view(b, self.radix, -1, *x.shape[2:])
        gap = F.adaptive_avg_pool2d(splits.sum(dim=1), 1)
        gap = self.relu(self.bn1(self.fc1(gap)))
        atten = self.fc2(gap)
        a = atten.view(b, self.groups, self.radix, -1).transpose(1, 2)
        a = F.softmax(a, dim=1).reshape(b, -1)
        attens = a.view(b, self.radix, -1, 1, 1)
        return torch.sum(attens * splits, dim=1).contiguous()


class TorchSplAtBottleneck(tnn.Module):
    """mmcv ResNeSt Bottleneck transcription (reference resnest.py:149-268)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=4, radix=2):
        super().__init__()
        width = planes if groups == 1 else (planes * base_width // 64) * groups
        self.avd = stride > 1  # avg_down_stride=True default
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = TorchSplAtConv(width, stride=1 if self.avd else stride,
                                    groups=groups, radix=radix)
        self.avd_layer = tnn.AvgPool2d(3, stride, padding=1) if self.avd else None
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.conv2(out)
        if self.avd_layer is not None:
            out = self.avd_layer(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchVariantResNet(tnn.Module):
    """mmcv-layout ResNet with deep_stem / avg_down / groups / scales /
    radix options."""

    def __init__(self, depth, deep_stem=False, avg_down=False, groups=1,
                 base_width=4, scales=1, radix=0):
        super().__init__()
        self.scales = scales
        self.radix = radix
        arch = {18: ("basic", (2, 2, 2, 2)), 50: ("bottleneck", (3, 4, 6, 3))}[depth]
        self.block_kind, stage_blocks = arch
        self.deep_stem = deep_stem
        self.avg_down = avg_down
        self.groups = groups
        self.base_width = base_width
        if deep_stem:
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
                tnn.BatchNorm2d(32), tnn.ReLU(),
                tnn.Conv2d(32, 32, 3, padding=1, bias=False),
                tnn.BatchNorm2d(32), tnn.ReLU(),
                tnn.Conv2d(32, 64, 3, padding=1, bias=False),
                tnn.BatchNorm2d(64), tnn.ReLU(),
            )
        else:
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        for s, blocks in enumerate(stage_blocks):
            setattr(self, f"layer{s + 1}", self._make_layer(64 * 2 ** s, blocks, 1 if s == 0 else 2))

    def _make_layer(self, planes, blocks, stride):
        expansion = 4 if self.block_kind == "bottleneck" else 1
        downsample = None
        if stride != 1 or self.inplanes != planes * expansion:
            conv_stride = 1 if self.avg_down else stride
            mods = [
                tnn.Conv2d(self.inplanes, planes * expansion, 1, stride=conv_stride, bias=False),
                tnn.BatchNorm2d(planes * expansion),
            ]
            if self.avg_down:
                mods.insert(0, tnn.AvgPool2d(stride, stride, ceil_mode=True, count_include_pad=False))
            downsample = tnn.Sequential(*mods)
        if self.radix > 0:
            mk = lambda inp, pl, st, ds: TorchSplAtBottleneck(  # noqa: E731
                inp, pl, st, ds, self.groups, self.base_width, self.radix
            )
        elif self.scales > 1:
            mk = lambda inp, pl, st, ds: TorchBottle2neck(  # noqa: E731
                inp, pl, st, ds, self.scales, self.base_width
            )
        elif self.block_kind == "bottleneck":
            mk = lambda inp, pl, st, ds: TorchBottleneckX(  # noqa: E731
                inp, pl, st, ds, self.groups, self.base_width
            )
        else:
            mk = TorchBasicBlock
        expansion_planes = planes * expansion
        layers = [mk(self.inplanes, planes, stride, downsample)]
        self.inplanes = expansion_planes
        layers += [mk(self.inplanes, planes, 1, None) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        if self.deep_stem:
            x = self.stem(x)
        else:
            x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


def _convert_to_flax_vars(tmodel, fmodel, x_shape):
    import flax
    import jax
    import jax.numpy as jnp

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat = {}
    convert_resnet(sd, flat)
    flat = {(k[0],) + k[2:]: v for k, v in flat.items()}
    converted = flax.traverse_util.unflatten_dict(flat)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros(x_shape, jnp.float32), train=False)
    flat_v = flax.traverse_util.flatten_dict(variables)
    flat_c = flax.traverse_util.flatten_dict(converted)
    assert set(flat_v) == set(flat_c), (
        f"missing={sorted(set(flat_v) - set(flat_c))[:5]} extra={sorted(set(flat_c) - set(flat_v))[:5]}"
    )
    for k in flat_v:
        assert flat_v[k].shape == np.asarray(flat_c[k]).shape, k
    return flax.traverse_util.unflatten_dict(flat_c)


# One representative (ResNeXt-50 grouped conv) stays in the fast suite; the
# full variant sweep is `slow` (each case torch-transcribes a 50-layer net on
# a 1-core CI host — ~25 s apiece).
@pytest.mark.parametrize(
    "depth,kwargs",
    [
        (18, dict(deep_stem=True, avg_down=True)),  # ResNetV1d-18 (fast representative)
        pytest.param(50, dict(groups=32, base_width=4), marks=pytest.mark.slow),  # ResNeXt-50 32x4d
        pytest.param(50, dict(deep_stem=True, avg_down=True, groups=32, base_width=4), marks=pytest.mark.slow),  # ResNeSt-style combo
        pytest.param(50, dict(deep_stem=True, avg_down=True, scales=4, base_width=26), marks=pytest.mark.slow),  # Res2Net-50
        pytest.param(50, dict(deep_stem=True, avg_down=True, radix=2), marks=pytest.mark.slow),  # ResNeSt-50
        # grouped split-attention stresses the group-major gate layout
        pytest.param(50, dict(deep_stem=True, avg_down=True, radix=2, groups=2, base_width=16), marks=pytest.mark.slow),
    ],
)
def test_variant_forward_parity(depth, kwargs, rng):
    import jax.numpy as jnp

    from radet_tpu.models.resnet import ResNet

    tmodel = TorchVariantResNet(depth, **kwargs)
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(1))
    tmodel.eval()

    fmodel = ResNet(depth=depth, out_indices=(0, 1, 2, 3), norm_eval=True, **kwargs)
    # odd 68x84 input -> odd 17x21 maps force the ceil-mode avg_down path
    x = rng.rand(2, 68, 84, 3).astype(np.float32) * 4 - 2
    variables = _convert_to_flax_vars(tmodel, fmodel, (1,) + x.shape[1:])

    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert len(t_outs) == len(f_outs) == 4
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t = t.numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f)
        assert t.shape == f.shape, (i, t.shape, f.shape)
        np.testing.assert_allclose(f, t, rtol=1e-4, atol=1e-4)


class TorchRegNet(tnn.Module):
    """mmcv-layout RegNetX transcription (reference regnet.py:84-320):
    bare 3x3/2 stem (no maxpool), expansion-1 bottlenecks with per-stage
    widths/groups, every stage stride 2."""

    def __init__(self, arch_name, stem_channels=32):
        super().__init__()
        from radet_tpu.models.resnet import REGNET_ARCH, regnet_stage_params

        widths, blocks, bot_widths, groups = regnet_stage_params(REGNET_ARCH[arch_name])
        self.conv1 = tnn.Conv2d(3, stem_channels, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(stem_channels)
        self.relu = tnn.ReLU()
        inplanes = stem_channels
        self.num_stages = len(blocks)
        for s, (w, n, wb, g) in enumerate(zip(widths, blocks, bot_widths, groups)):
            layers = []
            for b in range(n):
                stride = 2 if b == 0 else 1
                downsample = None
                if b == 0 and (stride != 1 or inplanes != w):
                    downsample = tnn.Sequential(
                        tnn.Conv2d(inplanes, w, 1, stride=stride, bias=False),
                        tnn.BatchNorm2d(w),
                    )
                block = tnn.Module()
                block.conv1 = tnn.Conv2d(inplanes, wb, 1, bias=False)
                block.bn1 = tnn.BatchNorm2d(wb)
                block.conv2 = tnn.Conv2d(wb, wb, 3, stride=stride, padding=1, groups=g, bias=False)
                block.bn2 = tnn.BatchNorm2d(wb)
                block.conv3 = tnn.Conv2d(wb, w, 1, bias=False)
                block.bn3 = tnn.BatchNorm2d(w)
                block.downsample = downsample
                layers.append(block)
                inplanes = w
            setattr(self, f"layer{s + 1}", tnn.ModuleList(layers))

    def forward(self, x):
        relu = self.relu
        x = relu(self.bn1(self.conv1(x)))
        outs = []
        for s in range(self.num_stages):
            for blk in getattr(self, f"layer{s + 1}"):
                idn = x
                out = relu(blk.bn1(blk.conv1(x)))
                out = relu(blk.bn2(blk.conv2(out)))
                out = blk.bn3(blk.conv3(out))
                if blk.downsample is not None:
                    idn = blk.downsample(x)
                x = relu(out + idn)
            outs.append(x)
        return outs


def test_regnet_stage_params_match_published():
    """Generator output vs the published pycls RegNetX model specs."""
    from radet_tpu.models.resnet import REGNET_ARCH, regnet_stage_params

    widths, blocks, _, groups = regnet_stage_params(REGNET_ARCH["regnetx_400mf"])
    assert widths == [32, 64, 160, 384]
    assert blocks == [1, 2, 7, 12]
    widths32, blocks32, _, _ = regnet_stage_params(REGNET_ARCH["regnetx_3.2gf"])
    assert widths32 == [96, 192, 432, 1008]
    assert blocks32 == [2, 6, 15, 2]


@pytest.mark.slow
def test_regnet_forward_parity(rng):
    import jax.numpy as jnp

    from radet_tpu.models.resnet import RegNet

    torch.manual_seed(7)
    tmodel = TorchRegNet("regnetx_400mf")
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(3))
    tmodel.eval()

    fmodel = RegNet(arch="regnetx_400mf", out_indices=(0, 1, 2, 3), norm_eval=True)
    x = rng.rand(2, 68, 84, 3).astype(np.float32) * 4 - 2
    variables = _convert_to_flax_vars(tmodel, fmodel, (1,) + x.shape[1:])

    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert len(t_outs) == len(f_outs) == 4
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t = t.numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f)
        assert t.shape == f.shape, (i, t.shape, f.shape)
        np.testing.assert_allclose(f, t, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_builder_backbone_types():
    import jax
    import jax.numpy as jnp

    from radet_tpu.models import build_detector

    for backbone in (
        dict(type="ResNetV1d", depth=18),
        dict(type="ResNeXt", depth=50, groups=32, base_width=4),
        dict(type="Res2Net", depth=50),  # defaults: scales=4, base_width=26
        dict(type="RegNet", arch="regnetx_400mf"),
        dict(type="ResNeSt", depth=50, radix=2),
    ):
        model = build_detector(
            dict(
                type="RADet",
                backbone=backbone,
                neck=dict(out_channels=64, start_level=1, num_outs=5),
                bbox_head=dict(num_classes=3, stacked_convs=1, feat_channels=64),
            )
        )
        outs = model.init_with_output(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)), train=False
        )[0]
        assert len(outs[0]) == 5  # cls levels

    # HourglassNet has no neck-composable output contract (standalone module)
    with pytest.raises(AssertionError):
        build_detector(dict(type="RADet", backbone=dict(type="HourglassNet"),
                            neck=dict(), bbox_head=dict(num_classes=3)))


def test_stem_s2d_matches_plain_conv(rng):
    """Space-to-depth stem == plain 7x7/2 conv (same param), incl. the
    odd-size fallback path."""
    import jax
    import jax.numpy as jnp

    from radet_tpu.models.resnet import StemConvS2D

    mod = StemConvS2D(8, use_s2d=True)
    for h, w in ((32, 40), (33, 41)):
        x = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        ref = jax.lax.conv_general_dilated(
            x, variables["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert y.shape == ref.shape, (h, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)
