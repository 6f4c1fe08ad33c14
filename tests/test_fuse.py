"""fuse_conv_bn: exact BN-into-conv folding (reference tools/test.py:173-174).

Every BN here is frozen (norm_eval running stats), so fused outputs must
match unfused ones to float tolerance — we randomize the BN statistics and
affines first so the fold is non-trivial, then compare forward passes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import freeze, unfreeze

from radet_tpu.models.fuse import fuse_conv_bn
from radet_tpu.models.resnet import ResNet


def _randomize_bn(variables, seed=0, mild=False):
    """Give every BN non-trivial statistics/affine so folding changes weights.

    ``mild`` keeps the per-BN gain near 1 — needed for gated architectures
    (ResNeSt's radix softmax): aggressive gains inflate the gate logits to
    O(100s), where f32 rounding of *either* path legitimately moves the
    saturated softmax by percents, drowning the comparison.
    """
    rs = np.random.RandomState(seed)
    tree = unfreeze(variables)
    v_lo, v_hi = (0.8, 1.25) if mild else (0.2, 3.0)
    s_lo, s_hi = (0.9, 1.1) if mild else (0.5, 2.0)
    b_sd = 0.1 if mild else 1.0

    def walk(node):
        if not isinstance(node, dict):
            return
        if {"mean", "var"} <= set(node):
            node["mean"] = jnp.asarray(rs.normal(0, b_sd, node["mean"].shape), jnp.float32)
            node["var"] = jnp.asarray(rs.uniform(v_lo, v_hi, node["var"].shape), jnp.float32)
            return
        for v in node.values():
            walk(v)

    walk(tree["batch_stats"])
    # BN affines live under params; randomize only BatchNorm_0 subtrees there
    def walk_params(node):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k == "BatchNorm_0" and isinstance(v, dict) and {"scale", "bias"} <= set(v):
                v["scale"] = jnp.asarray(rs.uniform(s_lo, s_hi, v["scale"].shape), jnp.float32)
                v["bias"] = jnp.asarray(rs.normal(0, b_sd, v["bias"].shape), jnp.float32)
            else:
                walk_params(v)

    walk_params(tree["params"])
    return freeze(tree)


def _check_exact(model, variables, x, min_fused, mild=False, **call_kw):
    variables = _randomize_bn(variables, mild=mild)
    ref = model.apply(variables, x, train=False, **call_kw)
    fused, report = fuse_conv_bn(variables)
    assert report["fused"] >= min_fused, report
    out = model.apply(fused, x, train=False, **call_kw)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        a, b = np.asarray(a), np.asarray(b)
        # exact up to f32 accumulation noise, which scales with the
        # (randomized-BN-inflated) activation magnitude
        tol = 2e-5 * (1.0 + float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol)
    return report


@pytest.mark.parametrize(
    "kwargs,min_fused,mild",
    [
        (dict(depth=18), 17, False),  # stem + 8 basic blocks x2 + downsample bns
        (dict(depth=50, deep_stem=True, avg_down=True), 40, False),  # V1d
        pytest.param(
            dict(depth=50, groups=32, base_width=4), 40, False,
            marks=pytest.mark.slow,
        ),  # ResNeXt (grouped-conv folding; V1d keeps the fast depth-50 rep)
        pytest.param(
            dict(depth=50, scales=4, base_width=26, deep_stem=True, avg_down=True),
            40, False, marks=pytest.mark.slow,
        ),  # Res2Net
        # ResNeSt (incl. the fc1/bn1 gate pair) is gated -> mild randomization
        pytest.param(
            dict(depth=50, radix=2, deep_stem=True, avg_down=True),
            40, True, marks=pytest.mark.slow,
        ),
    ],
)
def test_resnet_family_fuse_exact(kwargs, min_fused, mild):
    model = ResNet(out_indices=(0, 1, 2, 3), **kwargs)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    report = _check_exact(model, variables, x, min_fused, mild=mild)
    assert report["skipped"] == 0, report["skipped_paths"]


@pytest.mark.slow
def test_darknet_fuse_exact():
    from radet_tpu.models.backbones_extra import Darknet

    model = Darknet()
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    report = _check_exact(model, variables, x, min_fused=20)
    assert report["skipped"] == 0, report["skipped_paths"]


@pytest.mark.slow
def test_detectors_sac_convs_skipped_but_exact():
    """SAC convs re-standardize weights at call time; their BNs must be left
    unfused and the output still exact."""
    from radet_tpu.models.backbones_extra import DetectoRSResNet

    model = DetectoRSResNet(depth=50, stage_with_sac=(False, True, True, True))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    report = _check_exact(model, variables, x, min_fused=10)
    assert report["skipped"] > 0  # the SAC convs' BNs


def test_full_detector_fuse_exact():
    """End-to-end: the flagship detector's raw head outputs match post-fuse."""
    from radet_tpu.models.builder import build_detector

    model = build_detector(
        dict(
            type="RADet",
            backbone=dict(depth=18, out_indices=(0, 1, 2, 3)),
            neck=dict(out_channels=64, start_level=1, num_outs=5),
            bbox_head=dict(num_classes=3, stacked_convs=1, feat_channels=64),
        )
    )
    x = jnp.asarray(np.random.RandomState(2).rand(1, 128, 160, 3), jnp.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x, train=False))
    ref = model.apply(variables, x, train=False)
    fused, report = fuse_conv_bn(variables)
    assert report["fused"] >= 17 and report["skipped"] == 0, report
    out = model.apply(fused, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-5 * (1.0 + float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol)
