"""Frozen-stage int8 training (models/resnet.py::ResNet.frozen_int8).

The contract: with ``frozen_int8=True`` the frozen prefix of the backbone
runs the int8_stream DEPLOY arithmetic during training (train=True), the
first trainable stage consumes the dequantized stream, gradients behave
exactly as in the plain frozen path (zero through the boundary), and eval
is the plain float path (the flag is train-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.models.builder import build_detector
from radet_tpu.models.resnet import ResNet


def _x(key=0, hw=(64, 64)):
    rs = np.random.RandomState(key)
    return jnp.asarray(rs.rand(1, *hw, 3).astype(np.float32))


@pytest.mark.slow
def test_frozen_prefix_equals_stream_deploy():
    """All stages frozen: the fi8 train forward IS the int8_stream eval
    forward — same quantize/int8-conv/dequantize sequence, same scales."""
    x = _x()
    m_q8 = ResNet(depth=50, quant="int8_stream", frozen_stages=4)
    m_fi8 = ResNet(depth=50, frozen_int8=True, frozen_stages=4)
    variables = m_q8.init(jax.random.PRNGKey(0), x, train=False)
    y_deploy = m_q8.apply(variables, x, train=False)
    y_train = m_fi8.apply(variables, x, train=True)
    assert len(y_deploy) == len(y_train) == 4
    for a, b in zip(y_deploy, y_train):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg="fi8 train forward != int8_stream deploy forward",
        )


def test_eval_is_plain_float_path():
    """frozen_int8 is inactive at eval: forward == the plain ResNet."""
    x = _x(1)
    m_plain = ResNet(depth=50, frozen_stages=1)
    m_fi8 = ResNet(depth=50, frozen_int8=True, frozen_stages=1)
    variables = m_plain.init(jax.random.PRNGKey(0), x, train=False)
    y_plain = m_plain.apply(variables, x, train=False)
    y_fi8 = m_fi8.apply(variables, x, train=False)
    for a, b in zip(y_plain, y_fi8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gradients_zero_through_frozen_prefix_finite_after():
    """Backward matches the plain frozen semantics: zero grads for the
    frozen stem+layer1 params, finite nonzero grads for layer2+."""
    x = _x(2)
    m = ResNet(depth=50, frozen_int8=True, frozen_stages=1)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        outs = m.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=True,
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
    frozen_prefixes = ("['conv1']", "['bn1']", "['layer1_")
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        if name.startswith(frozen_prefixes):
            assert not np.any(np.asarray(g)), f"frozen param {name} got a gradient"
    l2 = [np.abs(np.asarray(g)).sum() for p, g in flat
          if "layer2_" in jax.tree_util.keystr(p)]
    assert l2 and sum(l2) > 0, "no gradient reached layer2"


def test_builder_plumbs_and_fails_fast():
    cfg = dict(
        type="RADet",
        backbone=dict(depth=50, frozen_stages=1, norm_eval=True,
                      frozen_int8=True),
        neck=dict(out_channels=64, start_level=1, num_outs=5),
        bbox_head=dict(num_classes=3, in_channels=64, stacked_convs=1,
                       feat_channels=64),
    )
    model = build_detector(cfg)
    assert model.backbone_frozen_int8

    bad = dict(cfg, backbone=dict(cfg["backbone"], quant="int8"))
    with pytest.raises(AssertionError, match="frozen_int8"):
        build_detector(bad)

    bad2 = dict(cfg, backbone=dict(cfg["backbone"], frozen_stages=-1))
    with pytest.raises(AssertionError, match="frozen_stages"):
        build_detector(bad2)


def test_config_builds():
    import os.path as osp

    from radet_tpu.utils import Config

    cfg = Config.fromfile(
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "configs/bop/r50_ycbv_pbr_frozen_int8.py")
    )
    model = build_detector(cfg.model, dtype="bfloat16")
    assert model.backbone_frozen_int8 and model.backbone_quant is None
