import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.models import build_detector, flatten_head_outputs


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model_cfg = dict(
        type="RADet",
        backbone=dict(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
        neck=dict(out_channels=64, start_level=1, num_outs=5),
        bbox_head=dict(num_classes=4, stacked_convs=2, feat_channels=64),
    )
    model = build_detector(model_cfg)
    x = jnp.zeros((1, 128, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_output_shapes(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.zeros((2, 128, 160, 3), jnp.float32)
    cls_list, reg_list, iou_list = model.apply(variables, x, train=False)
    assert len(cls_list) == 5
    expected = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    for (h, w), c, r, i in zip(expected, cls_list, reg_list, iou_list):
        assert c.shape == (2, h, w, 4)
        assert r.shape == (2, h, w, 4)
        assert i.shape == (2, h, w, 1)
    # reg predictions are ReLU'd (radet_head.py:29)
    for r in reg_list:
        assert float(jnp.min(r)) >= 0.0


def test_flatten_matches_anchor_count(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.zeros((1, 128, 160, 3), jnp.float32)
    outs = model.apply(variables, x, train=False)
    cls, reg, iou = flatten_head_outputs(*outs)
    n = 16 * 20 + 8 * 10 + 4 * 5 + 2 * 3 + 1 * 2
    assert cls.shape == (1, n, 4)
    assert reg.shape == (1, n, 4)
    assert iou.shape == (1, n)


def test_cls_bias_init(tiny_model_and_vars):
    _, variables = tiny_model_and_vars
    bias = variables["params"]["bbox_head"]["conv_cls"]["bias"]
    np.testing.assert_allclose(np.asarray(bias), -np.log(99.0), rtol=1e-5)


def test_batch_stats_collection_exists(tiny_model_and_vars):
    _, variables = tiny_model_and_vars
    assert "batch_stats" in variables
    # BN in backbone only; head uses GN (params), FPN has no norm
    assert "backbone" in variables["batch_stats"]
    assert "neck" not in variables["batch_stats"]
