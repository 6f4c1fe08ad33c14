"""Unit tests for the shared int8 PTQ primitives (radet_tpu/ops/quant.py)
and the backbone trunk quantization surface (models/resnet.py).

The end-to-end detection-delta bounds live in tests/test_int8_deploy.py
(slow); these are the fast structural/numerical invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.ops.quant import Int8Conv, affine_act_scale, quantize_int8


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def test_affine_act_scale_per_channel():
    g = jnp.asarray([1.0, -2.0, 0.5])
    b = jnp.asarray([0.5, 0.0, -1.0])
    s = affine_act_scale(g, b, k=4.0)
    np.testing.assert_allclose(
        np.asarray(s), np.array([4.5, 8.0, 3.0]) / 127.0, rtol=1e-6
    )
    assert s.shape == (3,)


def test_quantize_int8_per_channel_broadcast(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    s = jnp.asarray([0.1, 0.02, 0.5])
    q = quantize_int8(x, s)
    assert q.dtype == jnp.int8
    ref = np.clip(np.round(np.asarray(x) / np.asarray(s)), -127, 127)
    np.testing.assert_array_equal(np.asarray(q), ref.astype(np.int8))


def test_int8conv_grouped_fold_matches_per_group_slices(rng):
    """The grouped per-channel weight fold must map scale s_c to exactly the
    kernel columns consuming channel c: a grouped Int8Conv equals running
    each group's channel/feature slice through its own ungrouped Int8Conv."""
    groups, cin_total, feats = 4, 16, 24
    cpg, fpg = cin_total // groups, feats // groups
    kernel = rng.randn(3, 3, cpg, feats).astype(np.float32)
    s = jnp.asarray(rng.rand(cin_total).astype(np.float32) * 0.1 + 0.01)
    xq = jnp.asarray(rng.randint(-127, 128, (2, 8, 8, cin_total)), jnp.int8)

    conv_g = Int8Conv(feats, feature_group_count=groups, out_dtype=jnp.float32)
    yg = conv_g.apply({"params": {"kernel": jnp.asarray(kernel)}}, xq, s)

    parts = []
    for g in range(groups):
        kg = kernel[:, :, :, g * fpg:(g + 1) * fpg]
        conv_1 = Int8Conv(fpg, out_dtype=jnp.float32)
        parts.append(
            conv_1.apply(
                {"params": {"kernel": jnp.asarray(kg)}},
                xq[..., g * cpg:(g + 1) * cpg],
                s[g * cpg:(g + 1) * cpg],
            )
        )
    np.testing.assert_allclose(
        np.asarray(yg), np.asarray(jnp.concatenate(parts, axis=-1)),
        rtol=1e-5, atol=1e-5,
    )


def test_int8conv_approximates_float_conv(rng):
    """Per-channel static path: quantization error bounded by the step."""
    cin, feats = 8, 16
    kernel = (rng.randn(3, 3, cin, feats) * 0.1).astype(np.float32)
    s = jnp.asarray(rng.rand(cin).astype(np.float32) * 0.05 + 0.01)
    x = jnp.asarray(rng.rand(1, 6, 6, cin).astype(np.float32)) * s * 120
    xq = quantize_int8(x, s)
    y8 = Int8Conv(feats, out_dtype=jnp.float32).apply(
        {"params": {"kernel": jnp.asarray(kernel)}}, xq, s
    )
    yf = jax.lax.conv_general_dilated(
        np.asarray(x), kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
    )
    rel = float(jnp.abs(y8 - yf).mean() / (jnp.abs(yf).mean() + 1e-9))
    assert rel < 0.02, rel


@pytest.mark.parametrize("quant", ["int8", "int8_conv2"])
def test_resnet_trunk_quant_param_tree_identical(quant):
    from radet_tpu.models.resnet import ResNet

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = ResNet(depth=18).init(jax.random.PRNGKey(0), x, train=False)
    vq = ResNet(depth=18, quant=quant).init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)
    assert jax.tree_util.tree_map(lambda a: a.shape, v) == jax.tree_util.tree_map(
        lambda a: a.shape, vq
    )


def test_resnet_trunk_quant_noop_in_training():
    """quant='int8' must be BITWISE inert at train=True: round() has zero
    gradient, so a quantized train path would silently freeze the convs
    (apis/train.py also fails fast on quant configs)."""
    from radet_tpu.models.resnet import ResNet

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    m = ResNet(depth=18)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    mq = ResNet(depth=18, quant="int8")
    o = m.apply(v, x, train=True, mutable=["batch_stats"])[0]
    oq = mq.apply(v, x, train=True, mutable=["batch_stats"])[0]
    for a, b in zip(jax.tree_util.tree_leaves(o), jax.tree_util.tree_leaves(oq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_builder_trunk_quant_fail_fast():
    from radet_tpu.models.builder import build_detector

    head = dict(num_classes=3, in_channels=32, feat_channels=32, stacked_convs=1)
    with pytest.raises(AssertionError, match="ResNet/ResNeXt"):
        build_detector(
            dict(
                type="RADet",
                backbone=dict(type="Res2Net", depth=50, quant="int8"),
                neck=dict(out_channels=32, num_outs=5),
                bbox_head=head,
            )
        )
    with pytest.raises(AssertionError, match="unsupported"):
        build_detector(
            dict(
                type="RADet",
                backbone=dict(depth=50, quant="int4"),
                neck=dict(out_channels=32, num_outs=5),
                bbox_head=head,
            )
        )
