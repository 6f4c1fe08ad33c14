"""Checkpoint-import fidelity: a torch ResNet-50 (torchvision layout/naming,
built here since torchvision isn't installed) is converted through
tools/convert_torch_weights and must produce numerically identical feature
maps in the flax backbone — this guards the conv-transpose/padding/BN-eval
semantics that AP parity with released checkpoints depends on
(SURVEY.md §7 'checkpoint import fidelity')."""

import sys
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
from convert_torch_weights import convert_resnet, convert_mmdet_detector  # noqa: E402


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.randn(m.num_features) * 0.5, dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.rand(m.num_features) + 0.5, dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.2 + 1, dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.1, dtype=torch.float32))


@pytest.fixture(scope="module")
def torch_model_and_flax_vars():
    import flax
    import jax
    import jax.numpy as jnp

    from radet_tpu.models.resnet import ResNet

    rng = np.random.RandomState(0)
    tmodel = TorchResNet50()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    flat = {}
    convert_resnet(sd, flat)
    # the converter targets the full-detector tree ('backbone' subtree);
    # strip that level for the bare-ResNet comparison
    flat = {(k[0],) + k[2:]: v for k, v in flat.items()}
    converted = flax.traverse_util.unflatten_dict(flat)

    fmodel = ResNet(depth=50, out_indices=(0, 1, 2, 3), norm_eval=True)
    x = jnp.zeros((1, 64, 80, 3), jnp.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), x, train=False)
    # graft converted weights in (structure must match exactly)
    flat_v = flax.traverse_util.flatten_dict(variables)
    flat_c = flax.traverse_util.flatten_dict(converted)
    missing = set(flat_v) - set(flat_c)
    extra = set(flat_c) - set(flat_v)
    assert not missing, f"converter missed keys: {sorted(missing)[:5]}"
    assert not extra, f"converter produced unknown keys: {sorted(extra)[:5]}"
    for k in flat_v:
        assert flat_v[k].shape == np.asarray(flat_c[k]).shape, k
    variables = flax.traverse_util.unflatten_dict(flat_c)
    return tmodel, fmodel, variables


def test_resnet50_forward_parity(torch_model_and_flax_vars, rng):
    import jax.numpy as jnp

    tmodel, fmodel, variables = torch_model_and_flax_vars
    x = rng.rand(2, 64, 80, 3).astype(np.float32) * 4 - 2
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    f_outs = fmodel.apply(variables, jnp.asarray(x), train=False)
    assert len(t_outs) == len(f_outs) == 4
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t = t.numpy().transpose(0, 2, 3, 1)
        f = np.asarray(f)
        assert t.shape == f.shape, (i, t.shape, f.shape)
        np.testing.assert_allclose(f, t, rtol=1e-4, atol=1e-4)


def test_mmdet_head_conversion_keys():
    """The full-detector converter covers every flax param (no strays)."""
    import flax
    import jax
    import jax.numpy as jnp

    from radet_tpu.models import build_detector

    # build a torch-style state dict with mmdet naming for a tiny head config
    feat, stacked, ncls = 64, 2, 3  # feat must be divisible by GN's 32 groups
    sd = {}
    tm = TorchResNet50()
    sd.update({f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()})
    rng = np.random.RandomState(0)
    for i, cin in enumerate([512, 1024, 2048]):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = rng.randn(feat, cin, 1, 1).astype(np.float32)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = rng.randn(feat).astype(np.float32)
    for i in range(5):
        cin = feat
        sd[f"neck.fpn_convs.{i}.conv.weight"] = rng.randn(feat, cin, 3, 3).astype(np.float32)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = rng.randn(feat).astype(np.float32)
    for branch in ("cls", "reg"):
        for i in range(stacked):
            sd[f"bbox_head.{branch}_convs.{i}.conv.weight"] = rng.randn(feat, feat, 3, 3).astype(np.float32)
            sd[f"bbox_head.{branch}_convs.{i}.gn.weight"] = rng.randn(feat).astype(np.float32)
            sd[f"bbox_head.{branch}_convs.{i}.gn.bias"] = rng.randn(feat).astype(np.float32)
    sd["bbox_head.atss_cls.weight"] = rng.randn(ncls, feat, 3, 3).astype(np.float32)
    sd["bbox_head.atss_cls.bias"] = rng.randn(ncls).astype(np.float32)
    sd["bbox_head.atss_reg.weight"] = rng.randn(4, feat, 3, 3).astype(np.float32)
    sd["bbox_head.atss_reg.bias"] = rng.randn(4).astype(np.float32)
    sd["bbox_head.atss_centerness.weight"] = rng.randn(1, feat, 3, 3).astype(np.float32)
    sd["bbox_head.atss_centerness.bias"] = rng.randn(1).astype(np.float32)
    for i in range(5):
        sd[f"bbox_head.scales.{i}.scale"] = np.asarray(1.0 + i * 0.1, np.float32)

    flat = {}
    convert_mmdet_detector(sd, flat)
    converted = flax.traverse_util.unflatten_dict(flat)

    model = build_detector(
        dict(
            type="RADet",
            backbone=dict(depth=50),
            neck=dict(out_channels=feat, start_level=1, num_outs=5),
            bbox_head=dict(num_classes=ncls, stacked_convs=stacked, feat_channels=feat),
        )
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)), train=False)
    flat_v = flax.traverse_util.flatten_dict(variables)
    flat_c = flax.traverse_util.flatten_dict(converted)
    missing = set(flat_v) - set(flat_c)
    extra = set(flat_c) - set(flat_v)
    assert not missing, f"missing: {sorted(missing)[:8]}"
    assert not extra, f"extra: {sorted(extra)[:8]}"
    for k in flat_v:
        assert flat_v[k].shape == np.asarray(flat_c[k]).shape, k
    np.testing.assert_allclose(
        np.asarray(flat_c[("params", "bbox_head", "scales")]), [1.0, 1.1, 1.2, 1.3, 1.4], rtol=1e-6
    )
