"""int8 deploy path, end-to-end (VERDICT r3 item 2).

The int8 head tower (models/radet_head.py::_Int8Conv) is a deploy-time
switch: identical param tree, tower 3x3 convs dynamically quantized onto the
MXU's 2x-rate int8 path.  These tests bound the DETECTION delta of that
switch on the same deterministic torch-transcription weights the golden
fixtures use (tests/test_detector_parity.py) — realistic non-degenerate
score/box distributions, no egress needed — and pin that the shipped config
variant (configs/bop/r50_ycbv_pbr_int8.py) builds the quantized model.

Measured bound (this fixture, 2 imgs, 97+ dets each): >=90% of f32
detections have a same-label int8 match at IoU>=0.8 with |dScore|<=0.05.
bench.py reports the corresponding throughput (int8_img_s) on the real chip.
"""

import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))

from test_detector_parity import (  # noqa: E402
    FEAT,
    IMG_H,
    IMG_W,
    NCLS,
    STACKED,
    TorchRADet,
    _randomize,
)

TEST_CFG = dict(
    nms_pre=1000,
    score_thr=0.05,
    max_per_img=100,
    nms_topk=512,
    nms=dict(
        type="vote",
        iou_threshold=0.65,
        cluster_score=["cls", "iou"],
        vote_score=["iou", "cls"],
        iou_enable=False,
        sigma=0.025,
    ),
)
IMG_NORM = dict(mean=[0.0, 0.0, 0.0], std=[1.0, 1.0, 1.0])


def _model_cfg(quant):
    return dict(
        type="RADet",
        backbone=dict(depth=50),
        neck=dict(out_channels=FEAT, start_level=1, num_outs=5),
        bbox_head=dict(
            num_classes=NCLS, stacked_convs=STACKED, feat_channels=FEAT,
            quant=quant,
        ),
    )


@pytest.fixture(scope="module")
def dets_pair():
    """Detections from the SAME converted weights, quant off vs on."""
    import flax
    import jax

    from convert_torch_weights import convert_mmdet_detector
    from radet_tpu.core.anchors import generate_anchors
    from radet_tpu.engine.train_step import build_infer_step
    from radet_tpu.models import build_detector

    torch.manual_seed(7)
    rng = np.random.RandomState(7)
    tmodel = TorchRADet()
    _randomize(tmodel, rng)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat = {}
    convert_mmdet_detector(sd, flat)
    variables = flax.traverse_util.unflatten_dict(flat)

    anchors, _, _, counts = generate_anchors((IMG_H, IMG_W))
    # uint8 imagery through the real preprocess (identity norm keeps the
    # activation range realistic for the dynamic activation quantizer)
    images = rng.randint(0, 255, (2, IMG_H, IMG_W, 3)).astype(np.uint8)
    shapes = np.asarray([[IMG_H, IMG_W]] * 2, np.float32)
    scales = np.ones((2, 4), np.float32)

    out = {}
    for quant in (None, "int8"):
        model = build_detector(_model_cfg(quant))
        infer = build_infer_step(
            model, anchors, counts, img_norm=IMG_NORM, test_cfg=TEST_CFG
        )
        det = jax.device_get(infer(variables, images, shapes, scales))
        out[quant or "f32"] = det
    return out


def _valid_rows(det, img):
    v = np.asarray(det.valid[img], bool)
    return (
        np.asarray(det.boxes[img])[v],
        np.asarray(det.scores[img])[v],
        np.asarray(det.labels[img])[v],
    )


def _iou_matrix(a, b):
    ax1, ay1, ax2, ay2 = [a[:, i, None] for i in range(4)]
    bx1, by1, bx2, by2 = [b[None, :, i] for i in range(4)]
    iw = np.maximum(0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    ih = np.maximum(0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def test_int8_detection_delta_bounded(dets_pair):
    """>=90% of f32 detections have a same-label int8 match at IoU>=0.8
    with |dScore| <= 0.05; the fixture is non-degenerate (>=50 dets/img)."""
    f32, int8 = dets_pair["f32"], dets_pair["int8"]
    for img in range(2):
        fb, fs, fl = _valid_rows(f32, img)
        ib, is_, il = _valid_rows(int8, img)
        assert len(fb) >= 50, "degenerate fixture — no detections to compare"
        iou = _iou_matrix(fb, ib)
        same_label = fl[:, None] == il[None, :]
        cand = np.where(same_label, iou, 0.0)
        best = cand.argmax(axis=1)
        best_iou = cand[np.arange(len(fb)), best]
        matched = best_iou >= 0.8
        match_rate = matched.mean()
        assert match_rate >= 0.9, (img, match_rate, len(fb), len(ib))
        dscore = np.abs(fs[matched] - is_[best[matched]])
        assert dscore.max() <= 0.05, (img, float(dscore.max()))


def test_int8_config_builds_quantized_model():
    from radet_tpu.models import build_detector
    from radet_tpu.utils import Config

    cfg = Config.fromfile("configs/bop/r50_ycbv_pbr_int8.py")
    model = build_detector(cfg.model.to_dict(), dtype="bfloat16")
    assert model.head_quant == "int8"
    # identical param-tree contract: the int8 flag must not change the tree
    base = Config.fromfile("configs/bop/r50_ycbv_pbr.py")
    assert base.model.to_dict()["bbox_head"].keys() | {"quant"} == set(
        cfg.model.to_dict()["bbox_head"].keys()
    ) | {"quant"}
    # the _full variant additionally quantizes the backbone trunk
    cfg_f = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_full.py")
    model_f = build_detector(cfg_f.model.to_dict(), dtype="bfloat16")
    assert model_f.head_quant == "int8" and model_f.backbone_quant == "int8"
    # the _conv2 middle point keeps the 1x1 trunk projections bf16
    cfg_c = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_conv2.py")
    model_c = build_detector(cfg_c.model.to_dict(), dtype="bfloat16")
    assert (
        model_c.head_quant == "int8" and model_c.backbone_quant == "int8_conv2"
    )


# ---------------------------------------------------------------------------
# Backbone trunk int8 (r50_ycbv_pbr_int8_full.py): conv2/conv3 of every
# block run int8 with static per-channel frozen-BN-derived activation
# scales (models/resnet.py::_bn_act_scale, ops/quant.py).
#
# The parity fixture's randomized weights form a CHAOTIC network — any
# rounding noise roughly doubles per stage (measured: the production bf16
# trunk itself deviates from f32 by 1.8% at C2 growing to 9.6% at C5, and
# its detections only match f32 at ~0.8 @ IoU0.8).  Absolute bounds are
# therefore meaningless here; what IS stable and meaningful is the RATIO of
# int8's noise to bf16's own rounding noise on the same fixture (measured
# 1.5-1.7x per level), plus a detection-level sanity vs the bf16 deploy
# baseline at IoU 0.5.  On a trained (well-conditioned) checkpoint both
# collapse together; docs/PARITY_RUNBOOK.md + tools/compare_ap.py measure
# the real AP delta where data exists.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def calibrated_trunk():
    """Torch RADet with BN running stats CALIBRATED on the test imagery —
    the on-distribution stats a genuinely pretrained checkpoint has, which
    the static k-sigma activation bound assumes."""
    import flax

    from convert_torch_weights import convert_mmdet_detector

    torch.manual_seed(7)
    rng = np.random.RandomState(7)
    tmodel = TorchRADet()
    _randomize(tmodel, rng)
    images = rng.randint(0, 255, (2, IMG_H, IMG_W, 3)).astype(np.uint8)
    tmodel.backbone.train()
    with torch.no_grad():
        x = torch.tensor(images.transpose(0, 3, 1, 2).astype(np.float32))
        for _ in range(30):
            tmodel.backbone(x)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    flat = {}
    convert_mmdet_detector(sd, flat)
    return flax.traverse_util.unflatten_dict(flat), images


def test_trunk_int8_noise_within_bf16_envelope(calibrated_trunk):
    """Per level C2..C5, the int8 trunk's deviation from the f32 reference
    is at most 2.2x the production bf16 trunk's own rounding deviation
    (measured ratios 1.5-1.7; the bound leaves margin, and a regression to
    per-TENSOR scales or a loosened k would break it: per-tensor k=8
    measured 2.7-3.7x)."""
    import jax.numpy as jnp

    from radet_tpu.models.resnet import ResNet

    variables, images = calibrated_trunk
    bvars = {c: variables[c]["backbone"] for c in variables if "backbone" in variables[c]}
    xin = jnp.asarray(images, jnp.float32)
    of = ResNet(depth=50).apply(bvars, xin, train=False)
    obf = ResNet(depth=50, dtype=jnp.bfloat16).apply(bvars, xin, train=False)
    oq = ResNet(depth=50, quant="int8").apply(bvars, xin, train=False)
    for lvl, (a, b16, b8) in enumerate(zip(of, obf, oq)):
        a = np.asarray(a, np.float64)
        scale = np.abs(a).mean() + 1e-9
        rel16 = np.abs(a - np.asarray(b16, np.float64)).mean() / scale
        rel8 = np.abs(a - np.asarray(b8, np.float64)).mean() / scale
        assert rel8 <= 2.2 * rel16, (lvl, rel8, rel16, rel8 / rel16)


def test_trunk_int8_detection_delta_vs_bf16(calibrated_trunk):
    """Full-int8 detections vs the bf16 deploy baseline on the calibrated
    fixture: >=75% same-label matches at IoU>=0.5 with |dScore| <= 0.08
    (measured 0.82-0.83 / 0.042; see the envelope note above for why the
    chaotic fixture cannot support the head-only test's 0.9 @ IoU0.8)."""
    import jax

    from radet_tpu.core.anchors import generate_anchors
    from radet_tpu.engine.train_step import build_infer_step
    from radet_tpu.models import build_detector

    variables, images = calibrated_trunk
    anchors, _, _, counts = generate_anchors((IMG_H, IMG_W))
    shapes = np.asarray([[IMG_H, IMG_W]] * 2, np.float32)
    scales = np.ones((2, 4), np.float32)

    dets = {}
    for key, quant in (("bf16", None), ("int8", "int8")):
        cfg = _model_cfg(quant)
        cfg["backbone"]["quant"] = quant
        model = build_detector(cfg, dtype="bfloat16")
        infer = build_infer_step(
            model, anchors, counts, img_norm=IMG_NORM, test_cfg=TEST_CFG
        )
        dets[key] = jax.device_get(infer(variables, images, shapes, scales))

    for img in range(2):
        fb, fs, fl = _valid_rows(dets["bf16"], img)
        ib, is_, il = _valid_rows(dets["int8"], img)
        assert len(fb) >= 50, "degenerate fixture"
        cand = np.where(fl[:, None] == il[None, :], _iou_matrix(fb, ib), 0.0)
        best = cand.argmax(axis=1)
        best_iou = cand[np.arange(len(fb)), best]
        matched = best_iou >= 0.5
        assert matched.mean() >= 0.75, (img, matched.mean())
        dscore = np.abs(fs[matched] - is_[best[matched]])
        assert dscore.max() <= 0.08, (img, float(dscore.max()))


# ---------------------------------------------------------------------------
# int8_stream (r50_ycbv_pbr_int8_stream.py): the residual stream itself is
# carried as int8 with cross-block accumulated static bounds
# (models/resnet.py::_bn_affine_stats / _stream_scale).  Same measurement
# protocol and caveats as the trunk tests above: the meaningful stable
# quantity on the chaotic random fixture is the noise RATIO vs bf16's own
# rounding, not absolute deltas.  Measured here: stream 2.59-2.88x vs the
# full-trunk variant's 1.47-1.69x — the "~2.7x vs ~1.7x" envelope the
# config documents.
# ---------------------------------------------------------------------------


def test_trunk_int8_stream_noise_ratio(calibrated_trunk):
    """Per level C2..C5, int8_stream's deviation from f32 is 2.0-3.3x the
    bf16 trunk's own rounding deviation (measured 2.59-2.88x).  The upper
    bound catches a regression in the accumulated stream bounds (a broken
    quadrature accumulation measured >4x by layer3); the lower bound keeps
    the documented '~2.7x' envelope honest — tighten the config claim if an
    improvement lands."""
    import jax.numpy as jnp

    from radet_tpu.models.resnet import ResNet

    variables, images = calibrated_trunk
    bvars = {c: variables[c]["backbone"] for c in variables if "backbone" in variables[c]}
    xin = jnp.asarray(images, jnp.float32)
    of = ResNet(depth=50).apply(bvars, xin, train=False)
    obf = ResNet(depth=50, dtype=jnp.bfloat16).apply(bvars, xin, train=False)
    osq = ResNet(depth=50, quant="int8_stream").apply(bvars, xin, train=False)
    for lvl, (a, b16, b8s) in enumerate(zip(of, obf, osq)):
        a = np.asarray(a, np.float64)
        scale = np.abs(a).mean() + 1e-9
        rel16 = np.abs(a - np.asarray(b16, np.float64)).mean() / scale
        rel8s = np.abs(a - np.asarray(b8s, np.float64)).mean() / scale
        ratio = rel8s / rel16
        assert 2.0 <= ratio <= 3.3, (lvl, ratio, rel8s, rel16)


def test_stream_qat_forward_matches_deploy(calibrated_trunk):
    """The QAT train-time forward (STE fake-quant, f32 convs) tracks the
    int8_stream deploy forward: exact at the first stage (C2 rel < 2e-3;
    the only difference is f32 vs int32 accumulation of on-grid products)
    and within 1.6x of bf16's own rounding noise at every later stage (the
    chaotic random fixture doubles ANY infinitesimal difference per block
    — measured 0.33-1.35x; a true grid mismatch, e.g. the pre-fix bf16 QAT
    conv, measured >3x at C2 alone)."""
    import jax.numpy as jnp

    from radet_tpu.models.resnet import ResNet

    variables, images = calibrated_trunk
    bvars = {c: variables[c]["backbone"] for c in variables if "backbone" in variables[c]}
    xin = jnp.asarray(images, jnp.float32)
    of = ResNet(depth=50).apply(bvars, xin, train=False)
    obf = ResNet(depth=50, dtype=jnp.bfloat16).apply(bvars, xin, train=False)
    odep = ResNet(depth=50, quant="int8_stream").apply(bvars, xin, train=False)
    oqat = ResNet(depth=50, quant="int8_stream", qat=True, frozen_stages=-1).apply(
        bvars, xin, train=True, mutable=["batch_stats"]
    )[0]
    for lvl, (a, b16, dep, qat) in enumerate(zip(of, obf, odep, oqat)):
        dep = np.asarray(dep, np.float64)
        scale = np.abs(dep).mean() + 1e-9
        rel_qd = np.abs(dep - np.asarray(qat, np.float64)).mean() / scale
        if lvl == 0:
            assert rel_qd < 2e-3, rel_qd
        a = np.asarray(a, np.float64)
        rel16 = np.abs(a - np.asarray(b16, np.float64)).mean() / (
            np.abs(a).mean() + 1e-9
        )
        assert rel_qd <= 1.6 * rel16, (lvl, rel_qd, rel16)


def test_stream_detection_delta_vs_bf16(calibrated_trunk):
    """int8_stream detections vs the bf16 deploy baseline on the calibrated
    fixture: >=65% same-label matches at IoU>=0.5 with |dScore| <= 0.08
    (measured 0.72-0.74 / 0.050 — looser than int8_full's 0.82, consistent
    with the 2.7x-vs-1.7x noise envelope; see the chaotic-fixture note
    above for why absolute AP is measured elsewhere)."""
    import jax

    from radet_tpu.core.anchors import generate_anchors
    from radet_tpu.engine.train_step import build_infer_step
    from radet_tpu.models import build_detector

    variables, images = calibrated_trunk
    anchors, _, _, counts = generate_anchors((IMG_H, IMG_W))
    shapes = np.asarray([[IMG_H, IMG_W]] * 2, np.float32)
    scales = np.ones((2, 4), np.float32)

    dets = {}
    for key, quant in (("bf16", None), ("stream", "int8_stream")):
        cfg = _model_cfg("int8" if quant else None)
        cfg["backbone"]["quant"] = quant
        model = build_detector(cfg, dtype="bfloat16")
        infer = build_infer_step(
            model, anchors, counts, img_norm=IMG_NORM, test_cfg=TEST_CFG
        )
        dets[key] = jax.device_get(infer(variables, images, shapes, scales))

    for img in range(2):
        fb, fs, fl = _valid_rows(dets["bf16"], img)
        ib, is_, il = _valid_rows(dets["stream"], img)
        assert len(fb) >= 50, "degenerate fixture"
        cand = np.where(fl[:, None] == il[None, :], _iou_matrix(fb, ib), 0.0)
        best = cand.argmax(axis=1)
        best_iou = cand[np.arange(len(fb)), best]
        matched = best_iou >= 0.5
        assert matched.mean() >= 0.65, (img, matched.mean())
        dscore = np.abs(fs[matched] - is_[best[matched]])
        assert dscore.max() <= 0.08, (img, float(dscore.max()))


def test_stream_config_builds_and_is_qat_deployable():
    """The shipped stream + QAT configs build; the QAT config's param tree is
    identical to the float flagship (float ckpt loads directly, QAT output
    deploys directly — the r50_ycbv_pbr_int8_qat.py contract)."""
    import jax
    import jax.numpy as jnp

    from radet_tpu.models import build_detector
    from radet_tpu.utils import Config

    cfg_s = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_stream.py")
    m_s = build_detector(cfg_s.model.to_dict(), dtype="bfloat16")
    assert m_s.backbone_quant == "int8_stream" and m_s.head_quant == "int8"
    cfg_q = Config.fromfile("configs/bop/r50_ycbv_pbr_int8_qat.py")
    m_q = build_detector(cfg_q.model.to_dict(), dtype="bfloat16")
    assert m_q.backbone_qat and m_q.head_qat
    cfg_f = Config.fromfile("configs/bop/r50_ycbv_pbr.py")
    m_f = build_detector(cfg_f.model.to_dict(), dtype="bfloat16")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_f = m_f.init(jax.random.PRNGKey(0), x, train=False)
    v_q = m_q.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_f) == jax.tree_util.tree_structure(v_q)
