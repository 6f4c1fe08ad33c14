import jax.numpy as jnp
import numpy as np

from radet_tpu.models.radet_loss import radet_loss


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _decode_np(anchors, tblr, normalizer=1 / 8):
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    loc = tblr * normalizer
    t, bm, l, r = loc[:, 0] * h, loc[:, 1] * h, loc[:, 2] * w, loc[:, 3] * w
    return np.stack([cx - l, cy - t, cx + r, cy + bm], -1)


def _iou_np(a, b):
    xl = np.maximum(a[:, 0], b[:, 0])
    yt = np.maximum(a[:, 1], b[:, 1])
    xr = np.minimum(a[:, 2], b[:, 2])
    yb = np.minimum(a[:, 3], b[:, 3])
    inter = np.clip(xr - xl, 0, None) * np.clip(yb - yt, 0, None)
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a + area_b - inter, 1e-6)


def test_radet_loss_values(rng):
    n, c, g = 12, 3, 2
    anchors = np.zeros((n, 4), np.float32)
    cx = rng.uniform(100, 400, n)
    cy = rng.uniform(100, 300, n)
    anchors[:, 0], anchors[:, 1] = cx - 32, cy - 32
    anchors[:, 2], anchors[:, 3] = cx + 32, cy + 32

    # put the two positive anchors near their GTs so decoded preds overlap
    anchors[0] = [120, 120, 184, 184]
    anchors[1] = [280, 180, 344, 244]

    cls = rng.randn(1, n, c).astype(np.float32)
    reg = np.abs(rng.randn(1, n, 4)).astype(np.float32) + 2.0
    iou = rng.randn(1, n).astype(np.float32)
    gt_boxes = np.array([[[100, 100, 200, 200], [250, 150, 380, 280]]], np.float32)
    gt_labels = np.array([[1, 2]], np.int32)
    gt_idx = -np.ones((1, n), np.int32)
    weight = np.ones((1, n), np.float32)
    gt_idx[0, 0], weight[0, 0] = 0, 2.0
    gt_idx[0, 1], weight[0, 1] = 1, 1.0
    gt_idx[0, 2], weight[0, 2] = -2, 0.0  # ignore

    out = radet_loss(
        jnp.asarray(cls),
        jnp.asarray(reg),
        jnp.asarray(iou),
        jnp.asarray(anchors),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_idx),
        jnp.asarray(weight),
        num_classes=c,
    )
    assert float(out["num_pos"]) == 3.0

    # manual bbox loss for the two positives
    decoded = _decode_np(anchors, reg[0])
    pos_ids = [0, 1]
    tgt = gt_boxes[0][[0, 1]]
    iou_t = _iou_np(decoded[pos_ids], tgt)
    # giou
    lt = np.maximum(decoded[pos_ids][:, :2], tgt[:, :2])
    rb = np.minimum(decoded[pos_ids][:, 2:], tgt[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_p = (decoded[pos_ids][:, 2] - decoded[pos_ids][:, 0]) * (
        decoded[pos_ids][:, 3] - decoded[pos_ids][:, 1]
    )
    area_t = (tgt[:, 2] - tgt[:, 0]) * (tgt[:, 3] - tgt[:, 1])
    union = area_p + area_t - inter
    el = np.minimum(decoded[pos_ids][:, :2], tgt[:, :2])
    er = np.maximum(decoded[pos_ids][:, 2:], tgt[:, 2:])
    ewh = np.clip(er - el, 0, None)
    enc = ewh[:, 0] * ewh[:, 1]
    giou = inter / union - (enc - union) / enc
    w_pos = np.array([2.0, 1.0]) * np.clip(iou_t, 1e-12, None)
    assert iou_t.min() > 0, "test setup should give overlapping preds"
    want_bbox = ((1 - giou) * w_pos).sum() / w_pos.sum() * 2.0
    np.testing.assert_allclose(float(out["loss_bbox"]), want_bbox, rtol=1e-4)

    # manual iou loss
    p = iou[0][pos_ids]
    bce = np.maximum(p, 0) - p * iou_t + np.log1p(np.exp(-np.abs(p)))
    want_iou = (bce * np.array([2.0, 1.0])).sum() / 3.0
    np.testing.assert_allclose(float(out["loss_iou"]), want_iou, rtol=1e-4)

    assert np.isfinite(float(out["loss_cls"]))


def test_radet_loss_no_positives():
    n, c = 6, 3
    anchors = np.tile(np.array([[0, 0, 64, 64]], np.float32), (n, 1))
    out = radet_loss(
        jnp.zeros((1, n, c)),
        jnp.zeros((1, n, 4)),
        jnp.zeros((1, n)),
        jnp.asarray(anchors),
        jnp.zeros((1, 2, 4)),
        jnp.zeros((1, 2), jnp.int32),
        -jnp.ones((1, n), jnp.int32),
        jnp.ones((1, n)),
        num_classes=c,
    )
    assert float(out["num_pos"]) == 0
    assert float(out["loss_bbox"]) == 0
    assert float(out["loss_iou"]) == 0
    assert float(out["loss_cls"]) > 0  # negatives still contribute


def test_bbox_loss_type_routing(rng):
    """bbox_loss_type selects the config-chosen IoU loss variant; the
    variants disagree on imperfect boxes (so routing is observable)."""
    import jax.numpy as jnp

    from radet_tpu.models.radet_loss import radet_loss

    b, n, g, c = 1, 8, 2, 3
    anchors = np.stack([
        np.tile(np.arange(n) * 8.0, 1), np.zeros(n),
        np.tile(np.arange(n) * 8.0 + 16, 1), np.full(n, 16.0),
    ], axis=-1).astype(np.float32)
    cls = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    reg = jnp.asarray(np.abs(rng.randn(b, n, 4)).astype(np.float32))
    iou = jnp.asarray(rng.randn(b, n).astype(np.float32))
    gt_boxes = jnp.asarray([[[0, 0, 20, 14], [30, 2, 60, 15]]], jnp.float32)
    gt_labels = jnp.asarray([[1, 2]], jnp.int32)
    gt_idx = jnp.asarray([[0, 0, 1, 1, -1, -1, -2, -1]], jnp.int32)
    weight = jnp.asarray([[1, 0.5, 1, 1, 1, 1, 0, 1]], jnp.float32)

    out = {}
    for t in ("GIoULoss", "IoULoss", "BoundedIoULoss", "DIoULoss", "CIoULoss",
              "L1Loss", "SmoothL1Loss"):
        losses = radet_loss(cls, reg, iou, jnp.asarray(anchors), gt_boxes,
                            gt_labels, gt_idx, weight, num_classes=c,
                            bbox_loss_type=t)
        out[t] = float(losses["loss_bbox"])
        assert np.isfinite(out[t]), t
    assert len({round(v, 6) for v in out.values()}) == len(out), out
    # extra kwargs reach the implementation (linear vs log IoU differ)
    lin = radet_loss(cls, reg, iou, jnp.asarray(anchors), gt_boxes, gt_labels,
                     gt_idx, weight, num_classes=c, bbox_loss_type="IoULoss",
                     bbox_loss_extra=(("linear", True),))
    assert float(lin["loss_bbox"]) != out["IoULoss"]
