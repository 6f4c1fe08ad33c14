import jax.numpy as jnp
import numpy as np

from radet_tpu.ops import bce_with_logits, giou_loss, sigmoid_focal_loss


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _focal_np(logits, labels, num_classes, gamma=2.0, alpha=0.25):
    n, c = logits.shape
    target = np.zeros((n, c))
    for i, l in enumerate(labels):
        if l < num_classes:
            target[i, l] = 1
    p = _sigmoid(logits)
    ce = -(target * np.log(p) + (1 - target) * np.log(1 - p))
    pt = p * target + (1 - p) * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * (1 - pt) ** gamma
    return (ce * fw).sum(-1)


def test_focal_loss_matches_numpy(rng):
    logits = rng.randn(30, 5).astype(np.float32)
    labels = rng.randint(0, 6, 30)  # 5 = background
    weight = rng.uniform(0, 2, 30).astype(np.float32)
    want = (_focal_np(logits, labels, 5) * weight).sum() / 7.0
    got = float(
        sigmoid_focal_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(weight),
            num_classes=5,
            avg_factor=7.0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bce_soft_targets():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    targets = jnp.asarray([0.5, 1.0, 0.0])
    got = float(bce_with_logits(logits, targets))
    p = _sigmoid(np.array([0.0, 2.0, -2.0]))
    t = np.array([0.5, 1.0, 0.0])
    want = float((-(t * np.log(p) + (1 - t) * np.log(1 - p))).sum())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_giou_loss_zero_for_identical():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 20, 30]])
    assert float(giou_loss(boxes, boxes, loss_weight=1.0)) < 1e-5


# ---------------------------------------------------------------------------
# IoU-loss family (reference losses/iou_loss.py) — numpy transcriptions
# ---------------------------------------------------------------------------


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 50, (n, 2))
    wh = rng.uniform(1, 40, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def _iou_np(p, t, eps=0.0):
    lt = np.maximum(p[:, :2], t[:, :2])
    rb = np.minimum(p[:, 2:], t[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    ov = wh[:, 0] * wh[:, 1]
    ap = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
    ag = (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])
    return ov / (ap + ag - ov + eps)


def test_iou_loss_log_and_linear(rng):
    from radet_tpu.ops.losses import iou_loss

    p, t = _rand_boxes(rng, 40), _rand_boxes(rng, 40)
    w = rng.uniform(0, 2, 40).astype(np.float32)
    ious = np.clip(_iou_np(p, t), 1e-6, None)
    want_log = (-np.log(ious) * w).sum() / 5.0
    want_lin = ((1 - ious) * w).sum() / 5.0
    got_log = float(iou_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w),
                             avg_factor=5.0, loss_weight=1.0))
    got_lin = float(iou_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w),
                             avg_factor=5.0, loss_weight=1.0, linear=True))
    np.testing.assert_allclose(got_log, want_log, rtol=1e-4)
    np.testing.assert_allclose(got_lin, want_lin, rtol=1e-4)


def test_bounded_iou_loss_matches_reference_formula(rng):
    """Transcription of losses/iou_loss.py:38-79 (smooth-L1'd bound terms)."""
    from radet_tpu.ops.losses import bounded_iou_loss

    p, t = _rand_boxes(rng, 40), _rand_boxes(rng, 40)
    beta, eps = 0.2, 1e-3
    px, py = (p[:, 0] + p[:, 2]) / 2, (p[:, 1] + p[:, 3]) / 2
    pw, ph = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]
    tx, ty = (t[:, 0] + t[:, 2]) / 2, (t[:, 1] + t[:, 3]) / 2
    tw, th = t[:, 2] - t[:, 0], t[:, 3] - t[:, 1]
    dx, dy = tx - px, ty - py
    terms = np.stack([
        1 - np.maximum((tw - 2 * np.abs(dx)) / (tw + 2 * np.abs(dx) + eps), 0),
        1 - np.maximum((th - 2 * np.abs(dy)) / (th + 2 * np.abs(dy) + eps), 0),
        1 - np.minimum(tw / (pw + eps), pw / (tw + eps)),
        1 - np.minimum(th / (ph + eps), ph / (th + eps)),
    ], axis=-1)
    sl1 = np.where(terms < beta, 0.5 * terms**2 / beta, terms - 0.5 * beta)
    want = sl1.sum(-1).sum() / 4.0
    got = float(bounded_iou_loss(jnp.asarray(p), jnp.asarray(t),
                                 avg_factor=4.0, loss_weight=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_diou_ciou_match_reference_formula(rng):
    from radet_tpu.ops.losses import ciou_loss, diou_loss

    p, t = _rand_boxes(rng, 50), _rand_boxes(rng, 50)
    eps = 1e-7
    ious = _iou_np(p, t, eps)
    enc_w = np.maximum(p[:, 2], t[:, 2]) - np.minimum(p[:, 0], t[:, 0])
    enc_h = np.maximum(p[:, 3], t[:, 3]) - np.minimum(p[:, 1], t[:, 1])
    c2 = enc_w**2 + enc_h**2 + eps
    rho2 = (((t[:, 0] + t[:, 2]) - (p[:, 0] + p[:, 2]))**2
            + ((t[:, 1] + t[:, 3]) - (p[:, 1] + p[:, 3]))**2) / 4
    want_diou = (1 - (ious - rho2 / c2)).sum() / 10.0
    w1, h1 = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1] + eps
    w2, h2 = t[:, 2] - t[:, 0], t[:, 3] - t[:, 1] + eps
    v = 4 / np.pi**2 * (np.arctan(w2 / h2) - np.arctan(w1 / h1))**2
    want_ciou = (1 - (ious - (rho2 / c2 + v**2 / (1 - ious + v)))).sum() / 10.0
    got_diou = float(diou_loss(jnp.asarray(p), jnp.asarray(t), avg_factor=10.0,
                               loss_weight=1.0))
    got_ciou = float(ciou_loss(jnp.asarray(p), jnp.asarray(t), avg_factor=10.0,
                               loss_weight=1.0))
    np.testing.assert_allclose(got_diou, want_diou, rtol=1e-4)
    np.testing.assert_allclose(got_ciou, want_ciou, rtol=1e-4)


def test_ciou_nan_guard_identical_boxes():
    """Dense masked evaluation hits iou==1, v==0 cells (weight 0); the loss
    AND its gradient must stay finite (double-where guard)."""
    import jax

    from radet_tpu.ops.losses import ciou_loss

    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 8.0, 9.0]])
    w = jnp.asarray([0.0, 1.0])  # the perfect-match cell has zero weight

    def f(pred):
        return ciou_loss(pred, b, w, avg_factor=1.0, loss_weight=1.0)

    val, grad = jax.value_and_grad(f)(b)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_loss_cfg_from_reference_head_config():
    from radet_tpu.apis.common import loss_cfg_from
    from radet_tpu.utils import Config

    cfg = Config.fromfile("configs/bop/r50_ycbv_pbr.py")
    lc = loss_cfg_from(cfg)
    assert lc == dict(focal_gamma=2.0, focal_alpha=0.25, cls=1.0,
                      bbox_type="GIoULoss", bbox=2.0, bbox_extra=(), iou=1.0)
    # overrides flow through
    cfg.model.bbox_head.loss_bbox = dict(type="CIoULoss", loss_weight=3.0)
    cfg.model.bbox_head.loss_cls.gamma = 1.5
    lc = loss_cfg_from(cfg)
    assert lc["bbox_type"] == "CIoULoss" and lc["bbox"] == 3.0
    assert lc["focal_gamma"] == 1.5
    # box-space L1/SmoothL1 route too (mmdet weight-expansion semantics)
    cfg.model.bbox_head.loss_bbox = dict(type="SmoothL1Loss", beta=0.5)
    lc = loss_cfg_from(cfg)
    assert lc["bbox_type"] == "SmoothL1Loss" and lc["bbox_extra"] == (("beta", 0.5),)
    # unknown loss types fail fast
    cfg.model.bbox_head.loss_bbox = dict(type="GHMR")
    import pytest

    with pytest.raises(AssertionError, match="loss_bbox"):
        loss_cfg_from(cfg)
