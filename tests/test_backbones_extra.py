"""Extra-backbone parity: Darknet-53, HRNet, SSD-VGG, HourglassNet,
DetectoRS ResNet (SAC + RFP), TridentResNet against torch transcriptions of
the reference layouts (/root/reference/radet/models/backbones/{darknet,hrnet,
ssd_vgg,hourglass,detectors_resnet,trident_resnet}.py + mmcv SAConv2d),
converted through tools/convert_torch_weights.

The torch models carry the exact mmdet state_dict key layouts so the
checkpoint converters are exercised end-to-end, with randomized BN running
stats so a stats/params mixup cannot cancel out.
"""

import os.path as osp
import sys
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
from convert_torch_weights import (  # noqa: E402
    convert_darknet,
    convert_detectors_resnet,
    convert_hourglass,
    convert_hrnet,
    convert_ssd_vgg,
    convert_trident_resnet,
)

from test_backbone_variants import (  # noqa: E402
    TorchBasicBlock,
    TorchBottleneckX,
    _randomize_bn,
)


def _to_flax_vars(convert_fn, tmodel, fmodel, init_fn):
    """state_dict -> converter -> flax variables; asserts key/shape parity."""
    import flax
    import jax

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat = {}
    convert_fn(sd, flat)
    flat = {(k[0],) + k[2:]: v for k, v in flat.items()}  # drop 'backbone'
    converted = flax.traverse_util.unflatten_dict(flat)
    variables = init_fn(fmodel, jax.random.PRNGKey(0))
    flat_v = flax.traverse_util.flatten_dict(variables)
    flat_c = flax.traverse_util.flatten_dict(converted)
    assert set(flat_v) == set(flat_c), (
        f"missing={sorted(set(flat_v) - set(flat_c))[:6]} "
        f"extra={sorted(set(flat_c) - set(flat_v))[:6]}"
    )
    for k in flat_v:
        assert flat_v[k].shape == np.asarray(flat_c[k]).shape, (
            k, flat_v[k].shape, np.asarray(flat_c[k]).shape)
    return flax.traverse_util.unflatten_dict(flat_c)


def _assert_outs_match(t_outs, f_outs, rtol=1e-4, atol=1e-4):
    assert len(t_outs) == len(f_outs)
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t = t.detach().numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f)
        assert t.shape == f.shape, (i, t.shape, f.shape)
        np.testing.assert_allclose(f, t, rtol=rtol, atol=atol, err_msg=f"out {i}")


# ---------------------------------------------------------------------------
# shared torch building blocks (mmcv ConvModule / mmdet naming)
# ---------------------------------------------------------------------------


class TCM(tnn.Module):
    """mmcv ConvModule: conv (no bias when normed) + bn + activation."""

    def __init__(self, in_c, out_c, k, stride=1, padding=0, act="relu"):
        super().__init__()
        self.conv = tnn.Conv2d(in_c, out_c, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(out_c)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "relu":
            return F.relu(x)
        if self.act == "leaky":
            return F.leaky_relu(x, 0.1)
        return x


def _plain_downsample(in_c, out_c, stride=1):
    return tnn.Sequential(
        tnn.Conv2d(in_c, out_c, 1, stride=stride, bias=False),
        tnn.BatchNorm2d(out_c),
    )


# ---------------------------------------------------------------------------
# Darknet-53 (reference darknet.py)
# ---------------------------------------------------------------------------


class TorchDarkResBlock(tnn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.conv1 = TCM(in_c, in_c // 2, 1, act="leaky")
        self.conv2 = TCM(in_c // 2, in_c, 3, padding=1, act="leaky")

    def forward(self, x):
        return self.conv2(self.conv1(x)) + x


class TorchDarknet(tnn.Module):
    layers = (1, 2, 8, 8, 4)
    channels = ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))

    def __init__(self, out_indices=(3, 4, 5)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = TCM(3, 32, 3, padding=1, act="leaky")
        self.cr_blocks = ["conv1"]
        for i, n_res in enumerate(self.layers):
            in_c, out_c = self.channels[i]
            mods = [("conv", TCM(in_c, out_c, 3, stride=2, padding=1, act="leaky"))]
            mods += [(f"res{j}", TorchDarkResBlock(out_c)) for j in range(n_res)]
            name = f"conv_res_block{i + 1}"
            self.add_module(name, tnn.Sequential(OrderedDict(mods)))
            self.cr_blocks.append(name)

    def forward(self, x):
        outs = []
        for i, name in enumerate(self.cr_blocks):
            x = getattr(self, name)(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


@pytest.mark.slow
def test_darknet_parity(rng):
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import Darknet

    torch.manual_seed(0)
    tmodel = TorchDarknet()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(1))
    tmodel.eval()

    fmodel = Darknet(norm_eval=True)
    x = rng.rand(2, 63, 77, 3).astype(np.float32) * 2 - 1  # odd sizes
    variables = _to_flax_vars(
        convert_darknet, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    _assert_outs_match(t_outs, f_outs)


# ---------------------------------------------------------------------------
# HRNet (reference hrnet.py)
# ---------------------------------------------------------------------------

TINY_HRNET = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=2, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


class TorchHRModule(tnn.Module):
    def __init__(self, num_branches, num_blocks, in_channels):
        super().__init__()
        self.num_branches = num_branches
        self.branches = tnn.ModuleList([
            tnn.Sequential(*[TorchBasicBlock(in_channels[i], in_channels[i])
                             for _ in range(num_blocks[i])])
            for i in range(num_branches)
        ])
        fuse_layers = []
        for i in range(num_branches):
            fuse = []
            for j in range(num_branches):
                if j > i:
                    fuse.append(tnn.Sequential(
                        tnn.Conv2d(in_channels[j], in_channels[i], 1, bias=False),
                        tnn.BatchNorm2d(in_channels[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                    ))
                elif j == i:
                    fuse.append(None)
                else:
                    downs = []
                    for k in range(i - j):
                        if k == i - j - 1:
                            downs.append(tnn.Sequential(
                                tnn.Conv2d(in_channels[j], in_channels[i], 3,
                                           stride=2, padding=1, bias=False),
                                tnn.BatchNorm2d(in_channels[i])))
                        else:
                            downs.append(tnn.Sequential(
                                tnn.Conv2d(in_channels[j], in_channels[j], 3,
                                           stride=2, padding=1, bias=False),
                                tnn.BatchNorm2d(in_channels[j]), tnn.ReLU()))
                    fuse.append(tnn.Sequential(*downs))
            fuse_layers.append(tnn.ModuleList(fuse))
        self.fuse_layers = tnn.ModuleList(fuse_layers)

    def forward(self, x):
        for i in range(self.num_branches):
            x[i] = self.branches[i](x[i])
        x_fuse = []
        for i in range(len(self.fuse_layers)):
            y = 0
            for j in range(self.num_branches):
                y = y + (x[j] if i == j else self.fuse_layers[i][j](x[j]))
            x_fuse.append(F.relu(y))
        return x_fuse


class TorchHRNet(tnn.Module):
    def __init__(self, extra):
        super().__init__()
        self.extra = extra
        self.conv1 = tnn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, stride=2, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        s1 = extra["stage1"]
        planes = s1["num_channels"][0]
        blocks = [TorchBottleneckX(
            64, planes, downsample=_plain_downsample(64, planes * 4))]
        blocks += [TorchBottleneckX(planes * 4, planes)
                   for _ in range(s1["num_blocks"][0] - 1)]
        self.layer1 = tnn.Sequential(*blocks)
        pre = [planes * 4]
        for t, key in ((1, "stage2"), (2, "stage3"), (3, "stage4")):
            scfg = extra[key]
            cur = list(scfg["num_channels"])  # BASIC expansion 1
            transitions = []
            for i in range(scfg["num_branches"]):
                if i < len(pre):
                    if cur[i] != pre[i]:
                        transitions.append(tnn.Sequential(
                            tnn.Conv2d(pre[-1], cur[i], 3, padding=1, bias=False),
                            tnn.BatchNorm2d(cur[i]), tnn.ReLU()))
                    else:
                        transitions.append(None)
                else:
                    chain = []
                    for j in range(i + 1 - len(pre)):
                        out_c = cur[i] if j == i - len(pre) else pre[-1]
                        chain.append(tnn.Sequential(
                            tnn.Conv2d(pre[-1], out_c, 3, stride=2, padding=1,
                                       bias=False),
                            tnn.BatchNorm2d(out_c), tnn.ReLU()))
                    transitions.append(tnn.Sequential(*chain))
            setattr(self, f"transition{t}", tnn.ModuleList(transitions))
            setattr(self, f"stage{t + 1}", tnn.Sequential(*[
                TorchHRModule(scfg["num_branches"], scfg["num_blocks"], cur)
                for _ in range(scfg["num_modules"])
            ]))
            pre = cur

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        y_list = [x]
        for t in (1, 2, 3):
            scfg = self.extra[f"stage{t + 1}"]
            transition = getattr(self, f"transition{t}")
            x_list = []
            for i in range(scfg["num_branches"]):
                if transition[i] is not None:
                    x_list.append(transition[i](y_list[-1]))  # hrnet.py:511-524
                else:
                    x_list.append(y_list[i])
            y_list = getattr(self, f"stage{t + 1}")(x_list)
        return y_list


@pytest.mark.slow
def test_hrnet_parity(rng):
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import HRNet, freeze_cfg

    torch.manual_seed(1)
    tmodel = TorchHRNet(TINY_HRNET)
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(2))
    tmodel.eval()

    fmodel = HRNet(extra=freeze_cfg(TINY_HRNET), norm_eval=True)
    x = rng.rand(2, 64, 96, 3).astype(np.float32) * 2 - 1
    variables = _to_flax_vars(
        convert_hrnet, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    _assert_outs_match(t_outs, f_outs)


# ---------------------------------------------------------------------------
# SSD-VGG (reference ssd_vgg.py + mmcv VGG)
# ---------------------------------------------------------------------------


class TorchSSDVGG(tnn.Module):
    def __init__(self, input_size=300, depth=16,
                 out_feature_indices=(22, 34), l2_norm_scale=20.0):
        super().__init__()
        from radet_tpu.models.backbones_extra import (
            ssd_extra_layout, vgg_feature_layout)

        self.out_feature_indices = out_feature_indices
        mods, in_c = [], 3
        for spec in vgg_feature_layout(depth):
            if spec[0] == "conv":
                _, c, k, pad, dil = spec
                mods.append(tnn.Conv2d(in_c, c, k, padding=pad, dilation=dil))
                in_c = c
            elif spec[0] == "relu":
                mods.append(tnn.ReLU())
            else:
                _, k, stride, ceil = spec
                mods.append(tnn.MaxPool2d(k, stride, padding=0 if ceil else 1,
                                          ceil_mode=ceil))
        self.features = tnn.Sequential(*mods)
        extras = []
        for c, k, stride, pad in ssd_extra_layout(input_size):
            extras.append(tnn.Conv2d(in_c, c, k, stride=stride, padding=pad))
            in_c = c
        self.extra = tnn.Sequential(*extras)
        self.l2_norm = tnn.Module()
        self.l2_norm.weight = tnn.Parameter(
            torch.full((512,), float(l2_norm_scale)))

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.out_feature_indices:
                outs.append(x)
        for i, layer in enumerate(self.extra):
            x = F.relu(layer(x))
            if i % 2 == 1:
                outs.append(x)
        x0 = outs[0].float()
        norm = x0.pow(2).sum(1, keepdim=True).sqrt() + 1e-10
        outs[0] = self.l2_norm.weight[None, :, None, None] * x0 / norm
        return outs


@pytest.mark.slow
def test_ssd_vgg_parity(rng):
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import SSDVGG

    torch.manual_seed(2)
    tmodel = TorchSSDVGG()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.Conv2d):  # keep activations O(1) through 15 convs
                tnn.init.kaiming_normal_(m.weight, mode="fan_in",
                                         nonlinearity="relu")
                m.bias.data.normal_(0, 0.1)
        tmodel.l2_norm.weight.data.normal_(10.0, 1.0)
    tmodel.eval()

    fmodel = SSDVGG()
    x = rng.rand(1, 300, 300, 3).astype(np.float32) * 2 - 1
    variables = _to_flax_vars(
        convert_ssd_vgg, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    # expected SSD300 spatial progression (ssd_vgg.py docstring)
    assert [o.shape[1] for o in f_outs] == [38, 19, 10, 5, 3, 1]
    _assert_outs_match(t_outs, f_outs, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# HourglassNet (reference hourglass.py)
# ---------------------------------------------------------------------------


def _res_layer_t(in_c, out_c, blocks, stride=1, downsample_first=True):
    """mmdet ResLayer transcription (models/utils/res_layer.py)."""
    layers = []
    if downsample_first:
        ds = (_plain_downsample(in_c, out_c, stride)
              if stride != 1 or in_c != out_c else None)
        layers.append(TorchBasicBlock(in_c, out_c, stride, ds))
        layers += [TorchBasicBlock(out_c, out_c) for _ in range(blocks - 1)]
    else:
        layers += [TorchBasicBlock(in_c, in_c) for _ in range(blocks - 1)]
        ds = _plain_downsample(in_c, out_c) if in_c != out_c else None
        layers.append(TorchBasicBlock(in_c, out_c, 1, ds))
    return tnn.Sequential(*layers)


class TorchHourglassModule(tnn.Module):
    def __init__(self, depth, stage_channels, stage_blocks):
        super().__init__()
        self.depth = depth
        cur_c, next_c = stage_channels[0], stage_channels[1]
        cur_b, next_b = stage_blocks[0], stage_blocks[1]
        self.up1 = _res_layer_t(cur_c, cur_c, cur_b)
        self.low1 = _res_layer_t(cur_c, next_c, cur_b, stride=2)
        if depth > 1:
            self.low2 = TorchHourglassModule(depth - 1, stage_channels[1:],
                                             stage_blocks[1:])
        else:
            self.low2 = _res_layer_t(next_c, next_c, next_b)
        self.low3 = _res_layer_t(next_c, cur_c, cur_b, downsample_first=False)

    def forward(self, x):
        up1 = self.up1(x)
        low3 = self.low3(self.low2(self.low1(x)))
        return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")


class TorchHourglassNet(tnn.Module):
    def __init__(self, downsample_times=2, num_stacks=2,
                 stage_channels=(32, 32, 48), stage_blocks=(1, 1, 2),
                 feat_channel=16):
        super().__init__()
        self.num_stacks = num_stacks
        cur_c = stage_channels[0]
        self.stem = tnn.Sequential(
            TCM(3, 128, 7, stride=2, padding=3),
            tnn.Sequential(TorchBasicBlock(
                128, cur_c, 2, _plain_downsample(128, cur_c, 2))),
        )
        self.hourglass_modules = tnn.ModuleList([
            TorchHourglassModule(downsample_times, stage_channels, stage_blocks)
            for _ in range(num_stacks)
        ])
        self.inters = _res_layer_t(cur_c, cur_c, num_stacks - 1)
        self.conv1x1s = tnn.ModuleList([
            TCM(cur_c, cur_c, 1, act="none") for _ in range(num_stacks - 1)])
        self.out_convs = tnn.ModuleList([
            TCM(cur_c, feat_channel, 3, padding=1) for _ in range(num_stacks)])
        self.remap_convs = tnn.ModuleList([
            TCM(feat_channel, cur_c, 1, act="none")
            for _ in range(num_stacks - 1)])

    def forward(self, x):
        inter = self.stem(x)
        out_feats = []
        for ind in range(self.num_stacks):
            out = self.out_convs[ind](self.hourglass_modules[ind](inter))
            out_feats.append(out)
            if ind < self.num_stacks - 1:
                inter = self.conv1x1s[ind](inter) + self.remap_convs[ind](out)
                inter = self.inters[ind](F.relu(inter))
        return out_feats


@pytest.mark.slow
def test_hourglass_parity(rng):
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import HourglassNet

    torch.manual_seed(3)
    tmodel = TorchHourglassNet()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(4))
    tmodel.eval()

    fmodel = HourglassNet(downsample_times=2, num_stacks=2,
                          stage_channels=(32, 32, 48), stage_blocks=(1, 1, 2),
                          feat_channel=16, norm_eval=True)
    x = rng.rand(2, 64, 96, 3).astype(np.float32) * 2 - 1
    variables = _to_flax_vars(
        convert_hourglass, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert all(o.shape[1:3] == (16, 24) for o in f_outs)  # stride-4 stacks
    _assert_outs_match(t_outs, f_outs)


# ---------------------------------------------------------------------------
# DetectoRS ResNet: SAC (mmcv SAConv2d/ConvAWS2d) + RFP
# ---------------------------------------------------------------------------


class TorchSAConv2d(tnn.Module):
    """mmcv SAConv2d transcription (state keys: weight/weight_diff/
    weight_gamma/weight_beta + switch/pre_context/post_context)."""

    def __init__(self, in_c, out_c, stride=1, dilation=1, groups=1):
        super().__init__()
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.weight = tnn.Parameter(torch.empty(out_c, in_c // groups, 3, 3))
        tnn.init.kaiming_normal_(self.weight)
        self.weight_diff = tnn.Parameter(torch.empty(out_c, in_c // groups, 3, 3))
        self.weight_gamma = tnn.Parameter(torch.ones(out_c, 1, 1, 1))
        self.weight_beta = tnn.Parameter(torch.zeros(out_c, 1, 1, 1))
        self.switch = tnn.Conv2d(in_c, 1, 1, stride=stride)
        self.pre_context = tnn.Conv2d(in_c, in_c, 1)
        self.post_context = tnn.Conv2d(out_c, out_c, 1)

    def _get_weight(self):
        w = self.weight
        flat = w.view(w.size(0), -1)
        mean = flat.mean(dim=1).view(-1, 1, 1, 1)
        std = torch.sqrt(flat.var(dim=1) + 1e-5).view(-1, 1, 1, 1)
        w = (w - mean) / std
        return self.weight_gamma * w + self.weight_beta

    def forward(self, x):
        avg = F.adaptive_avg_pool2d(x, 1)
        x = x + self.pre_context(avg).expand_as(x)
        pad = F.pad(x, (2, 2, 2, 2), mode="reflect")
        switch = self.switch(F.avg_pool2d(pad, 5, stride=1, padding=0))
        w = self._get_weight()
        d = self.dilation
        out_s = F.conv2d(x, w, None, self.stride, padding=d, dilation=d,
                         groups=self.groups)
        out_l = F.conv2d(x, w + self.weight_diff, None, self.stride,
                         padding=3 * d, dilation=3 * d, groups=self.groups)
        out = switch * out_s + (1 - switch) * out_l
        avg = F.adaptive_avg_pool2d(out, 1)
        return out + self.post_context(avg).expand_as(out)


class TorchDetectoRSBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None, sac=False,
                 rfp_inplanes=0, width=0, groups=1):
        super().__init__()
        width = width or planes
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = (TorchSAConv2d(width, width, stride, groups=groups)
                      if sac else
                      tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                 groups=groups, bias=False))
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.rfp_inplanes = rfp_inplanes
        if rfp_inplanes:
            self.rfp_conv = tnn.Conv2d(rfp_inplanes, planes * 4, 1, bias=True)

    def forward(self, x, rfp_feat=None):
        idn = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        out = out + idn
        if self.rfp_inplanes and rfp_feat is not None:
            out = out + self.rfp_conv(rfp_feat)  # detectors_resnet.py:104-106
        return F.relu(out)


class TorchDetectoRSResNet(tnn.Module):
    stage_blocks = (3, 4, 6, 3)  # depth 50

    def __init__(self, stage_with_sac=(False, False, False, False),
                 rfp_inplanes=0, output_img=False, groups=1, base_width=4):
        super().__init__()
        self.output_img = output_img
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for s, blocks in enumerate(self.stage_blocks):
            planes = 64 * 2 ** s
            stride = 1 if s == 0 else 2
            width = (planes * base_width // 64) * groups if groups > 1 else 0
            mods = []
            for b in range(blocks):
                ds = (_plain_downsample(inplanes, planes * 4, stride)
                      if b == 0 else None)
                mods.append(TorchDetectoRSBlock(
                    inplanes, planes, stride if b == 0 else 1, ds,
                    sac=stage_with_sac[s],
                    rfp_inplanes=rfp_inplanes if (s > 0 and b == 0) else 0,
                    width=width, groups=groups))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", tnn.ModuleList(mods))

    def forward(self, x, rfp_feats=None):
        img = x
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = [img] if self.output_img else []
        for s in range(4):
            rfp_feat = rfp_feats[s] if (rfp_feats is not None and s > 0) else None
            for b, blk in enumerate(getattr(self, f"layer{s + 1}")):
                x = blk(x, rfp_feat if b == 0 else None)
            outs.append(x)
        return outs


@pytest.mark.parametrize(
    "groups,base_width",
    # the grouped (ResNeXt) variant is the heavier CPU compile — it lives in
    # the slow suite; the plain variant keeps SAC parity in the fast suite
    [(1, 4), pytest.param(32, 4, marks=pytest.mark.slow)],
)
def test_detectors_resnet_sac_parity(rng, groups, base_width):
    """groups=1: DetectoRS_ResNet; groups=32: DetectoRS_ResNeXt 32x4d
    (grouped-width bottlenecks + grouped SAC, detectors_resnext.py)."""
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import DetectoRSResNet

    torch.manual_seed(4)
    tmodel = TorchDetectoRSResNet(stage_with_sac=(False, True, True, True),
                                  groups=groups, base_width=base_width)
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(5))
        for m in tmodel.modules():
            if isinstance(m, TorchSAConv2d):
                m.weight_diff.data.normal_(0, 0.05)
                m.weight_gamma.data.normal_(1.0, 0.1)
                m.weight_beta.data.normal_(0, 0.02)
                # keep activations O(1) through 16 SAC blocks: the raw
                # (un-sigmoided) switch and the additive context paths
                # amplify; real checkpoints sit near switch==1
                m.switch.weight.data.mul_(0.02)
                m.switch.bias.data.fill_(0.5)
                m.pre_context.weight.data.mul_(0.1)
                m.pre_context.bias.data.mul_(0.1)
                m.post_context.weight.data.mul_(0.1)
                m.post_context.bias.data.mul_(0.1)
    tmodel.eval()

    fmodel = DetectoRSResNet(depth=50, stage_with_sac=(False, True, True, True),
                             groups=groups, base_width=base_width,
                             norm_eval=True)
    # odd sizes, but big enough that the stride-32 map (4x4) admits the
    # switch branch's reflect-pad-2 (needs dim >= 3)
    x = rng.rand(2, 97, 127, 3).astype(np.float32) * 2 - 1
    variables = _to_flax_vars(
        convert_detectors_resnet, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    # activations reach O(400) through 16 randomized-BN SAC blocks; the
    # remaining deltas are f32 conv summation-order noise
    _assert_outs_match(t_outs, f_outs, rtol=1e-3, atol=1e-2)


@pytest.mark.slow
def test_detectors_resnet_rfp_parity(rng):
    """rfp_forward equivalence: per-stage RFP feats added through the
    zero-init 1x1 on each stage's first block, + output_img contract."""
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import DetectoRSResNet

    torch.manual_seed(5)
    rfp_c = 24
    tmodel = TorchDetectoRSResNet(rfp_inplanes=rfp_c, output_img=True)
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(6))
        for name, m in tmodel.named_modules():
            if name.endswith("rfp_conv"):
                m.weight.data.normal_(0, 0.05)
                m.bias.data.normal_(0, 0.05)
    tmodel.eval()

    fmodel = DetectoRSResNet(depth=50, rfp_inplanes=rfp_c, output_img=True,
                             norm_eval=True)
    x = rng.rand(1, 64, 80, 3).astype(np.float32) * 2 - 1
    # rfp feats enter each stage's FIRST block after its stride: the feats
    # for stages 2/3/4 live at the stage OUTPUT resolutions /8, /16, /32
    sizes = [(8, 10), (4, 5), (2, 3)]
    rfp_np = [rng.rand(1, h, w, rfp_c).astype(np.float32) for h, w in sizes]
    rfp_f = [None] + [jnp.asarray(r) for r in rfp_np]
    rfp_t = [None] + [torch.tensor(r.transpose(0, 3, 1, 2)) for r in rfp_np]

    variables = _to_flax_vars(
        convert_detectors_resnet, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]),
                              rfp_feats=rfp_f, train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)), rfp_feats=rfp_t)
    f_outs = fmodel.apply(variables, jnp.asarray(x), rfp_feats=rfp_f, train=False)
    assert len(f_outs) == 5  # image + 4 stages
    _assert_outs_match(t_outs, f_outs)
    # plain forward (no rfp feats) also works with the same param tree
    f_plain = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert len(f_plain) == 5


# ---------------------------------------------------------------------------
# TridentResNet (reference trident_resnet.py)
# ---------------------------------------------------------------------------


class TorchTridentConv(tnn.Module):
    def __init__(self, in_c, out_c, stride=1, dilations=(1, 2, 3)):
        super().__init__()
        self.stride, self.dilations = stride, dilations
        self.weight = tnn.Parameter(torch.empty(out_c, in_c, 3, 3))
        tnn.init.kaiming_uniform_(self.weight)

    def forward(self, inputs, dils):
        return [F.conv2d(b, self.weight, None, self.stride, padding=d,
                         dilation=d) for b, d in zip(inputs, dils)]


class TorchTridentBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilations=(1, 2, 3), concat_output=False):
        super().__init__()
        self.dilations, self.concat_output = dilations, concat_output
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = TorchTridentConv(planes, planes, stride, dilations)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x, dils):
        if not isinstance(x, list):
            x = [x] * len(dils)
        identity = ([self.downsample(b) for b in x]
                    if self.downsample is not None else x)
        out = [F.relu(self.bn1(self.conv1(b))) for b in x]
        out = self.conv2(out, dils)
        out = [F.relu(self.bn2(b)) for b in out]
        out = [self.bn3(self.conv3(b)) for b in out]
        out = [F.relu(o + i) for o, i in zip(out, identity)]
        if self.concat_output:
            return torch.cat(out, dim=0)
        return out


class TorchTridentResNet(tnn.Module):
    def __init__(self, dilations=(1, 2, 3)):
        super().__init__()
        self.dilations = dilations
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for s, blocks in enumerate((3, 4)):
            planes = 64 * 2 ** s
            stride = 1 if s == 0 else 2
            mods = []
            for b in range(blocks):
                ds = (_plain_downsample(inplanes, planes * 4, stride)
                      if b == 0 else None)
                mods.append(TorchBottleneckX(
                    inplanes, planes, stride if b == 0 else 1, ds))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*mods))
        mods = []
        for b in range(6):  # depth-50 stage 3 = 6 blocks
            ds = _plain_downsample(inplanes, 1024, 2) if b == 0 else None
            mods.append(TorchTridentBlock(
                inplanes, 256, 2 if b == 0 else 1, ds, dilations,
                concat_output=(b == 5)))
            inplanes = 1024
        self.layer3 = tnn.ModuleList(mods)

    def forward(self, x, branch_idx=1):
        dils = self.dilations if branch_idx < 0 else (self.dilations[branch_idx],)
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        for blk in self.layer3:
            x = blk(x, dils)
        return [x]


@pytest.mark.parametrize("branch_idx", [1, -1])
def test_trident_resnet_parity(rng, branch_idx):
    import jax.numpy as jnp

    from radet_tpu.models.backbones_extra import TridentResNet

    torch.manual_seed(6)
    tmodel = TorchTridentResNet()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.RandomState(7))
    tmodel.eval()

    fmodel = TridentResNet(depth=50, test_branch_idx=branch_idx, norm_eval=True)
    x = rng.rand(1, 63, 77, 3).astype(np.float32) * 2 - 1
    variables = _to_flax_vars(
        convert_trident_resnet, tmodel, fmodel,
        lambda m, key: m.init(key, jnp.zeros((1,) + x.shape[1:]), train=False),
    )
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)),
                        branch_idx=branch_idx)
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    # branch_idx=-1 -> 3 branches concatenated along batch
    assert f_outs[0].shape[0] == (3 if branch_idx < 0 else 1)
    _assert_outs_match(t_outs, f_outs)


# ---------------------------------------------------------------------------
# builder/detector composition
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_builder_extra_backbones():
    import jax
    import jax.numpy as jnp

    from radet_tpu.models import build_detector

    cases = [
        # Darknet C3/C4/C5 + FPN: start_level 0 (strides already 8/16/32)
        dict(backbone=dict(type="Darknet", depth=53),
             neck=dict(out_channels=32, start_level=0, num_outs=5)),
        # HRNet 4-branch output at strides 4/8/16/32 + FPN(start_level=1)
        dict(backbone=dict(type="HRNet", extra=TINY_HRNET),
             neck=dict(out_channels=32, start_level=1, num_outs=5)),
        # DetectoRS-SAC composes exactly like ResNet
        dict(backbone=dict(type="DetectoRS_ResNet", depth=50,
                           sac=dict(type="SAC"),
                           stage_with_sac=(False, True, True, True)),
             neck=dict(out_channels=32, start_level=1, num_outs=5)),
    ]
    for case in cases:
        model = build_detector(dict(
            type="RADet",
            backbone=case["backbone"],
            neck=case["neck"],
            bbox_head=dict(num_classes=3, stacked_convs=1, feat_channels=32),
        ))
        outs = model.init_with_output(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False
        )[0]
        assert len(outs[0]) == 5, case["backbone"]["type"]

    # SSDVGG composes with ChannelMapper (6 levels, no FPN top-down)
    model = build_detector(dict(
        type="RADet",
        backbone=dict(type="SSDVGG", input_size=300, depth=16),
        neck=dict(type="ChannelMapper", out_channels=32, kernel_size=1),
        bbox_head=dict(num_classes=3, stacked_convs=1, feat_channels=32),
    ))
    outs = model.init_with_output(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False
    )[0]
    assert len(outs[0]) == 6

    # standalone-only modules fail fast in the builder
    for btype in ("HourglassNet", "TridentResNet"):
        with pytest.raises(AssertionError, match="standalone"):
            build_detector(dict(
                type="RADet", backbone=dict(type=btype),
                neck=dict(out_channels=32),
                bbox_head=dict(num_classes=3),
            ))
