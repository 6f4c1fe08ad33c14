"""Gradient-checkpointing parity (backbone with_cp, reference
resnet.py:85-88 torch cp.checkpoint -> flax nn.remat)."""

import jax
import jax.numpy as jnp
import numpy as np

from radet_tpu.models.resnet import ResNet
import pytest


def _loss_fn(model):
    def f(params, batch_stats, x):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    return f


@pytest.mark.slow
def test_with_cp_matches_plain_gradients():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 48, 3), jnp.float32)
    plain = ResNet(depth=18, frozen_stages=-1)
    remat = ResNet(depth=18, frozen_stages=-1, with_cp=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros_like(x), train=False)
    # identical param tree: checkpoints are interchangeable across with_cp
    v2 = remat.init(jax.random.PRNGKey(0), jnp.zeros_like(x), train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    p, bs = variables["params"], variables["batch_stats"]
    g_plain = jax.grad(_loss_fn(plain))(p, bs, x)
    g_remat = jax.grad(_loss_fn(remat))(p, bs, x)
    flat_a = jax.tree_util.tree_leaves(g_plain)
    flat_b = jax.tree_util.tree_leaves(g_remat)
    for a, b in zip(flat_a, flat_b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        # recomputation reorders f32 reductions; compare at per-tensor scale
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-4


@pytest.mark.slow
def test_with_cp_builder_and_eval_forward():
    from radet_tpu.models import build_detector

    model = build_detector(
        dict(
            type="RADet",
            backbone=dict(type="ResNet", depth=18, with_cp=True),
            neck=dict(out_channels=64, start_level=1, num_outs=5),
            bbox_head=dict(num_classes=3, stacked_convs=1, feat_channels=64),
        )
    )
    outs = model.init_with_output(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)), train=False
    )[0]
    assert len(outs[0]) == 5
