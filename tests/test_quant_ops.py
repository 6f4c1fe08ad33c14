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
    # eval_shape: abstract trace, no compile — the tree is what's under test
    v = jax.eval_shape(ResNet(depth=18).init, jax.random.PRNGKey(0), x)
    vq = jax.eval_shape(ResNet(depth=18, quant=quant).init, jax.random.PRNGKey(0), x)
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


# ---------------------------------------------------------------------------
# QAT primitives (ops/quant.py::fake_quant_ste / Int8Conv.qat): the forward
# must sit exactly on the deploy int8 grid and the backward must be the
# straight-through identity — the contract configs/bop/r50_ycbv_pbr_int8_qat.py
# trains against.
# ---------------------------------------------------------------------------


def test_fake_quant_ste_forward_is_deploy_grid(rng):
    from radet_tpu.ops.quant import fake_quant_ste

    x = jnp.asarray(rng.randn(64, 3).astype(np.float32)) * 2.0
    s = jnp.asarray([0.05, 0.2, 0.011])
    fq = fake_quant_ste(x, s)
    dequant = np.asarray(quantize_int8(x, s), np.float32) * np.asarray(s)
    np.testing.assert_allclose(np.asarray(fq), dequant, rtol=0, atol=5e-7)


def test_fake_quant_ste_gradient_identity(rng):
    """STE backward: d/dx sum(fake_quant(x)) == 1 elementwise, and the scale
    gets no gradient (it is recomputed from the fine-tuned affines at
    deploy, not learned)."""
    from radet_tpu.ops.quant import fake_quant_ste

    x = jnp.asarray(rng.randn(32).astype(np.float32))
    s = jnp.asarray(0.07)
    gx = jax.grad(lambda a: fake_quant_ste(a, s).sum())(x)
    np.testing.assert_array_equal(np.asarray(gx), np.ones(32, np.float32))
    gs = jax.grad(lambda b: fake_quant_ste(x, b).sum())(s)
    assert float(gs) == 0.0


def test_fake_quant_weight_ste_matches_int8conv_weight_grid(rng):
    """fake_quant_weight_ste must reproduce Int8Conv's own per-output-channel
    weight grid: dequantizing Int8Conv's w_q with its s_w equals the STE
    forward."""
    from radet_tpu.ops.quant import fake_quant_weight_ste

    k = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.2)
    s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(k / s_w), -127, 127)
    np.testing.assert_allclose(
        np.asarray(fake_quant_weight_ste(k)), np.asarray(w_q * s_w),
        rtol=0, atol=1e-7,
    )


def test_int8conv_qat_forward_matches_deploy(rng):
    """QAT train-time forward (f32 conv over fake-quantized values) equals
    the deploy int8 path (int32 MXU accumulation) up to float accumulation
    order — the 'forward sees the deploy arithmetic' contract (review
    finding r4: a bf16 QAT conv broke this by ~6-7%)."""
    cin, feats = 8, 16
    kernel = jnp.asarray((rng.randn(3, 3, cin, feats) * 0.1).astype(np.float32))
    s = jnp.asarray(rng.rand(cin).astype(np.float32) * 0.05 + 0.01)
    x = jnp.asarray(rng.rand(2, 6, 6, cin).astype(np.float32)) * s * 120

    conv_qat = Int8Conv(feats, qat=True, out_dtype=jnp.float32)
    y_qat = conv_qat.apply({"params": {"kernel": kernel}}, x, s, train=True)
    conv_dep = Int8Conv(feats, out_dtype=jnp.float32)
    y_dep = conv_dep.apply({"params": {"kernel": kernel}}, quantize_int8(x, s), s)
    rel = float(jnp.abs(y_qat - y_dep).max() / (jnp.abs(y_dep).max() + 1e-9))
    assert rel < 1e-5, rel


def test_int8conv_qat_inert_at_eval(rng):
    """train=False must run the true deploy arithmetic even on a qat=True
    module (in-training validation measures what ships; review finding r4)."""
    cin, feats = 4, 8
    kernel = jnp.asarray((rng.randn(1, 1, cin, feats) * 0.1).astype(np.float32))
    s = jnp.asarray(rng.rand(cin).astype(np.float32) * 0.05 + 0.01)
    xq = jnp.asarray(rng.randint(-127, 128, (1, 5, 5, cin)), jnp.int8)
    y_qat = Int8Conv(feats, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                     qat=True, out_dtype=jnp.float32).apply(
        {"params": {"kernel": kernel}}, xq, s, train=False)
    y_dep = Int8Conv(feats, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                     out_dtype=jnp.float32).apply(
        {"params": {"kernel": kernel}}, xq, s)
    np.testing.assert_array_equal(np.asarray(y_qat), np.asarray(y_dep))


def _small_head(qat):
    from radet_tpu.models.radet_head import RADetHead

    return RADetHead(num_classes=3, in_channels=32, feat_channels=32,
                     stacked_convs=2, num_levels=2, quant="int8", qat=qat)


def test_radet_head_qat_eval_equals_deploy(rng):
    """A qat head at train=False is BITWISE the deploy int8 head (the eval
    path during QAT fine-tuning measures deploy accuracy, not fake-quant
    bf16 — review finding r4)."""
    feats = [jnp.asarray(rng.rand(1, 8, 10, 32).astype(np.float32)),
             jnp.asarray(rng.rand(1, 4, 5, 32).astype(np.float32))]
    v = _small_head(False).init(jax.random.PRNGKey(0), feats)
    o_dep = _small_head(False).apply(v, feats)
    o_qat = _small_head(True).apply(v, feats, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(o_dep), jax.tree_util.tree_leaves(o_qat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_radet_head_qat_train_grads_flow(rng):
    feats = [jnp.asarray(rng.rand(1, 8, 10, 32).astype(np.float32)),
             jnp.asarray(rng.rand(1, 4, 5, 32).astype(np.float32))]
    head = _small_head(True)
    v = head.init(jax.random.PRNGKey(0), feats)

    def loss(params):
        outs = head.apply({"params": params}, feats, train=True)
        return sum(jnp.abs(t).sum() for lst in outs for t in lst)

    g = jax.grad(loss)(v["params"])
    gn = float(jnp.linalg.norm(g["cls_conv_1"]["conv"]["kernel"]))
    assert np.isfinite(gn) and gn > 0, gn


def test_resnet_stream_quant_param_tree_identical():
    from radet_tpu.models.resnet import ResNet

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.eval_shape(ResNet(depth=50).init, jax.random.PRNGKey(0), x)
    vq = jax.eval_shape(
        ResNet(depth=50, quant="int8_stream").init, jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)
    assert jax.tree_util.tree_map(lambda a: a.shape, v) == jax.tree_util.tree_map(
        lambda a: a.shape, vq
    )


def test_resnet_qat_eval_equals_stream_deploy(rng):
    """ResNet(quant='int8_stream', qat=True) at train=False runs the exact
    stream deploy path."""
    from radet_tpu.models.resnet import ResNet

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = ResNet(depth=50).init(jax.random.PRNGKey(0), x, train=False)
    o_dep = ResNet(depth=50, quant="int8_stream").apply(v, x, train=False)
    o_qat = ResNet(depth=50, quant="int8_stream", qat=True).apply(
        v, x, train=False)
    for a, b in zip(o_dep, o_qat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_builder_qat_fail_fast_on_unsupported_heads():
    """bbox_head.qat on ATSSHead/AnchorHead must raise, not silently train
    the plain path (review finding r4)."""
    from radet_tpu.models.builder import build_detector

    with pytest.raises(AssertionError, match="RADetHead"):
        build_detector(
            dict(
                type="SingleStageDetector",
                backbone=dict(depth=18),
                neck=dict(out_channels=32, num_outs=5),
                bbox_head=dict(
                    type="ATSSHead", num_classes=3, in_channels=32,
                    feat_channels=32, stacked_convs=1, quant="int8", qat=True,
                    anchor_generator=dict(
                        type="AnchorGenerator", ratios=[1.0],
                        octave_base_scale=8, scales_per_octave=1,
                        strides=[8, 16, 32, 64, 128]),
                ),
            )
        )
    with pytest.raises(AssertionError, match="backbone.qat"):
        build_detector(
            dict(
                type="RADet",
                backbone=dict(depth=18, qat=True),
                neck=dict(out_channels=32, num_outs=5),
                bbox_head=dict(num_classes=3, feat_channels=32, stacked_convs=1),
            )
        )


def test_train_api_admits_qat_rejects_plain_quant():
    """apis/train.py's quant gate: plain quant configs fail fast; the shipped
    QAT config passes (the round-4 ship-blocker: the documented QAT entry
    `tools/train.py r50_ycbv_pbr_int8_qat.py` died at this assert)."""
    from radet_tpu.apis.train import check_trainable_quant
    from radet_tpu.utils import Config

    cfg = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_qat.py")
    check_trainable_quant(cfg.model)  # must not raise
    # the QAT config must also BUILD (qat flags reach the modules)
    from radet_tpu.models import build_detector

    model = build_detector(cfg.model.to_dict(), dtype="bfloat16")
    assert model.backbone_qat and model.head_qat
    assert model.backbone_quant == "int8_stream" and model.head_quant == "int8"
    cfg_plain = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_full.py")
    with pytest.raises(AssertionError, match="deploy-time option"):
        check_trainable_quant(cfg_plain.model)
