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


def test_fpn_extra_conv_sources(rng):
    """add_extra_convs 'on_input'/'on_lateral'/'on_output' produce 5 levels
    with correct shapes; unknown values raise (reference fpn.py:66-221)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from radet_tpu.models.fpn import FPN

    feats = [
        jnp.asarray(rng.rand(1, 32 // (2 ** i), 40 // (2 ** i), 16 * 2 ** i).astype(np.float32))
        for i in range(4)
    ]
    for src in ("on_output", "on_input", "on_lateral"):
        fpn = FPN(out_channels=16, num_outs=5, start_level=1, add_extra_convs=src,
                  relu_before_extra_convs=(src == "on_input"))
        outs, _ = fpn.init_with_output(jax.random.PRNGKey(0), feats)
        assert len(outs) == 5
        assert outs[-1].shape[1:3] == (1, 2)  # stride-128 level
    with _pytest.raises(ValueError):
        FPN(out_channels=16, num_outs=5, start_level=1, add_extra_convs="bogus").init(
            jax.random.PRNGKey(0), feats
        )


def test_proposal_path_returns_anchors(rng):
    """with_nms=False exposes per-candidate anchors (reference
    radet_head.py:165-169 proposal contract for the pose stage)."""
    import jax.numpy as jnp

    from radet_tpu.models.postprocess import get_bboxes

    b, c = 2, 3
    shapes = [(8, 10), (4, 5)]
    anchors_per_level = [
        np.stack(np.meshgrid(np.arange(w_), np.arange(h_)), -1).reshape(-1, 2).astype(np.float32)
        for (h_, w_) in shapes
    ]
    anchors_per_level = [
        np.concatenate([a * 8, a * 8 + 32], -1) for a in anchors_per_level
    ]
    cls_list = [jnp.asarray(rng.randn(b, h_, w_, c).astype(np.float32)) for h_, w_ in shapes]
    reg_list = [jnp.asarray(np.abs(rng.randn(b, h_, w_, 4)).astype(np.float32)) for h_, w_ in shapes]
    iou_list = [jnp.asarray(rng.randn(b, h_, w_, 1).astype(np.float32)) for h_, w_ in shapes]
    det = get_bboxes(
        cls_list, reg_list, iou_list, anchors_per_level,
        jnp.full((b, 2), 64.0), jnp.ones((b, 4)),
        test_cfg=dict(score_thr=0.05, nms_topk=16, candidate_mode="global",
                      approx_topk=False),
        with_nms=False,
    )
    assert det.anchors is not None and det.anchors.shape == det.boxes.shape
    # every valid candidate's anchor is one of the real anchors
    all_anchors = np.concatenate(anchors_per_level, 0)
    got = np.asarray(det.anchors)[np.asarray(det.valid)]
    for a in got[:10]:
        assert (np.abs(all_anchors - a).sum(1) < 1e-4).any()


def test_channel_mapper(rng):
    """ChannelMapper maps each level to out_channels with no top-down path
    (reference channel_mapper.py:8-80)."""
    import jax
    import jax.numpy as jnp

    from radet_tpu.models.fpn import ChannelMapper

    feats = [
        jnp.asarray(rng.rand(2, 16 // (2 ** i), 20 // (2 ** i), 8 * 2 ** i).astype(np.float32))
        for i in range(3)
    ]
    cm = ChannelMapper(out_channels=24, kernel_size=3)
    outs, _ = cm.init_with_output(jax.random.PRNGKey(0), feats)
    assert len(outs) == 3
    for f, o in zip(feats, outs):
        assert o.shape == f.shape[:3] + (24,)
        assert (np.asarray(o) >= 0).all()  # ReLU default


class TestInt8QuantHead:
    """Deploy-time int8 tower quantization (radet_head._Int8Conv)."""

    def test_int8_conv_close_to_f32(self, rng):
        from radet_tpu.models.radet_head import _Int8Conv

        x = jnp.asarray(rng.normal(0, 1.5, (2, 16, 20, 32)).astype(np.float32))
        m = _Int8Conv(48)
        v = m.init(jax.random.PRNGKey(1), x)
        # reference f32 conv with the SAME kernel
        k = v["params"]["kernel"]
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )
        got = m.apply(v, x)
        # symmetric 8-bit dynamic quant: ~0.5% rms error on gaussian data
        denom = np.maximum(np.abs(np.asarray(ref)), 1e-3)
        rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
        assert np.median(rel) < 0.02
        assert float(jnp.mean((got - ref) ** 2)) < 1e-3 * float(jnp.mean(ref**2)) + 1e-6

    def test_param_tree_identical_and_outputs_close(self, rng):
        cfg = dict(
            type="RADet",
            backbone=dict(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=1),
            neck=dict(out_channels=64, start_level=1, num_outs=5),
            bbox_head=dict(num_classes=4, stacked_convs=2, feat_channels=64),
        )
        qcfg = {**cfg, "bbox_head": {**cfg["bbox_head"], "quant": "int8"}}
        model = build_detector(cfg)
        qmodel = build_detector(qcfg)
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 160, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        # the quantized head must accept the SAME variables (deploy-time flip)
        cls_f, reg_f, iou_f = model.apply(variables, x, train=False)
        cls_q, reg_q, iou_q = qmodel.apply(variables, x, train=False)
        for a, b in zip(cls_f, cls_q):
            assert a.shape == b.shape
            # GN renormalizes after every quantized conv, bounding drift;
            # class probabilities must agree closely
            pa, pb = jax.nn.sigmoid(a), jax.nn.sigmoid(b)
            assert float(jnp.max(jnp.abs(pa - pb))) < 0.05
        for a, b in zip(reg_f, reg_q):
            scale = float(jnp.maximum(jnp.max(jnp.abs(a)), 1.0))
            assert float(jnp.max(jnp.abs(a - b))) / scale < 0.08

    def test_bad_quant_flag_fails_fast(self):
        cfg = dict(
            type="RADet",
            backbone=dict(depth=50),
            neck=dict(out_channels=64),
            bbox_head=dict(num_classes=4, stacked_convs=2, feat_channels=64, quant="fp4"),
        )
        model = build_detector(cfg)
        with pytest.raises(ValueError, match="quant"):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
