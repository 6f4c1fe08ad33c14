"""ATSS / AnchorHead loss parity vs sequential numpy oracles.

The oracles transcribe the reference loss pipelines step-for-step
(/root/reference/radet/models/dense_heads/atss_head.py:147-303,
anchor_head.py:373-488, losses/focal_loss.py:10-41, iou_loss.py:18-80) as
per-image numpy loops — labeled semantic transcriptions.  They exercise the
full path: on-device assignment -> dense targets -> normalizers -> losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core.anchor_generator import AnchorGenerator, flat_anchors_for_input
from radet_tpu.core.box_coder import build_bbox_coder
from radet_tpu.models.anchor_loss import anchor_head_loss, atss_loss

from tests.test_anchor_assign import atss_oracle, max_iou_oracle, _iou


# ---------------------------------------------------------------- oracles


def focal_oracle(logits, labels, weights, num_classes, gamma=2.0, alpha=0.25):
    """mmdet py_sigmoid_focal_loss (focal_loss.py:10-41), reduction=sum."""
    target = np.eye(num_classes + 1)[labels][:, :num_classes]
    p = 1 / (1 + np.exp(-logits))
    ce = np.maximum(logits, 0) - logits * target + np.log1p(np.exp(-np.abs(logits)))
    pt = p * target + (1 - p) * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * (1 - pt) ** gamma
    return ((ce * fw).sum(-1) * weights).sum()


def giou_oracle(pred, target):
    """GIoU loss values (iou_loss.py:56-80), element-wise."""
    lt = np.maximum(pred[:, :2], target[:, :2])
    rb = np.minimum(pred[:, 2:], target[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    ap = np.clip(pred[:, 2] - pred[:, 0], 0, None) * np.clip(pred[:, 3] - pred[:, 1], 0, None)
    at = np.clip(target[:, 2] - target[:, 0], 0, None) * np.clip(target[:, 3] - target[:, 1], 0, None)
    union = np.maximum(ap + at - inter, 1e-6)
    iou = inter / union
    elt = np.minimum(pred[:, :2], target[:, :2])
    erb = np.maximum(pred[:, 2:], target[:, 2:])
    ewh = np.clip(erb - elt, 0, None)
    enclose = np.maximum(ewh[:, 0] * ewh[:, 1], 1e-6)
    return 1 - (iou - (enclose - union) / enclose)


def bce_oracle(logits, targets):
    return np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))


def delta_encode_np(proposals, gt):
    px = (proposals[:, 0] + proposals[:, 2]) / 2
    py = (proposals[:, 1] + proposals[:, 3]) / 2
    pw = proposals[:, 2] - proposals[:, 0]
    ph = proposals[:, 3] - proposals[:, 1]
    gx = (gt[:, 0] + gt[:, 2]) / 2
    gy = (gt[:, 1] + gt[:, 3]) / 2
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    return np.stack(
        [(gx - px) / pw, (gy - py) / ph, np.log(gw / pw), np.log(gh / ph)], -1
    )


def delta_decode_np(rois, deltas, wh_ratio_clip=16 / 1000):
    mr = abs(np.log(wh_ratio_clip))
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = np.clip(deltas[:, 2], -mr, mr)
    dh = np.clip(deltas[:, 3], -mr, mr)
    px = (rois[:, 0] + rois[:, 2]) / 2
    py = (rois[:, 1] + rois[:, 3]) / 2
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    return np.stack(
        [gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1
    )


def centerness_oracle(anchors, decoded_gts):
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    l_ = acx - decoded_gts[:, 0]
    t_ = acy - decoded_gts[:, 1]
    r_ = decoded_gts[:, 2] - acx
    b_ = decoded_gts[:, 3] - acy
    lr = np.stack([l_, r_], 1)
    tb = np.stack([t_, b_], 1)
    return np.sqrt((lr.min(1) / lr.max(1)) * (tb.min(1) / tb.max(1)))


def atss_loss_oracle(cls, reg, ctr, anchors, counts, gts_list, labels_list,
                     num_classes, topk=9, quality="centerness"):
    """Sequential ATSS loss pipeline (atss_head.py:147-303)."""
    B, N, C = cls.shape
    num_total_pos = 0
    per_image = []
    for i in range(B):
        assigned = atss_oracle(anchors, counts, gts_list[i], topk)
        pos_inds = np.nonzero(assigned > 0)[0]
        num_total_pos += max(len(pos_inds), 1)
        per_image.append((assigned, pos_inds))
    num_total_samples = max(num_total_pos, 1)

    loss_cls = 0.0
    bbox_terms = []
    ctr_terms = []
    bbox_avg = 0.0
    for i in range(B):
        assigned, pos_inds = per_image[i]
        labels = np.full(N, num_classes, np.int64)
        labels[pos_inds] = labels_list[i][assigned[pos_inds] - 1]
        weights = np.ones(N)
        loss_cls += focal_oracle(cls[i], labels, weights, num_classes)
        if len(pos_inds):
            pa = anchors[pos_inds]
            pgt = gts_list[i][assigned[pos_inds] - 1]
            ptargets = delta_encode_np(pa, pgt)
            dec_pred = delta_decode_np(pa, reg[i][pos_inds])
            dec_tgt = delta_decode_np(pa, ptargets)
            if quality == "centerness":
                q = centerness_oracle(pa, dec_tgt)
            else:
                q = np.diag(_iou(dec_pred, dec_tgt))
            bbox_terms.append((giou_oracle(dec_pred, dec_tgt) * q).sum())
            ctr_terms.append((bce_oracle(ctr[i][pos_inds], q)).sum())
            bbox_avg += q.sum()
    loss_cls = loss_cls / num_total_samples
    bbox_avg = bbox_avg if bbox_avg >= 1e-12 else 1.0
    loss_bbox = 2.0 * sum(bbox_terms) / bbox_avg
    loss_ctr = sum(ctr_terms) / num_total_samples
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_centerness=loss_ctr)


def anchor_loss_oracle(cls, reg, anchors, gts_list, labels_list, num_classes,
                       pos_thr=0.5, neg_thr=0.4, min_pos_iou=0.0,
                       beta=1.0 / 9.0):
    """Sequential AnchorHead (FocalLoss) pipeline (anchor_head.py:373-488)."""
    B, N, C = cls.shape
    num_total_pos = 0
    per_image = []
    for i in range(B):
        assigned = max_iou_oracle(anchors, gts_list[i], pos_thr, neg_thr,
                                  min_pos_iou)
        per_image.append(assigned)
        num_total_pos += max((assigned > 0).sum(), 1)
    num_total_samples = max(num_total_pos, 1)  # FocalLoss: sampling=False
    loss_cls = 0.0
    loss_bbox = 0.0
    for i in range(B):
        assigned = per_image[i]
        pos_inds = np.nonzero(assigned > 0)[0]
        labels = np.full(N, num_classes, np.int64)
        labels[pos_inds] = labels_list[i][assigned[pos_inds] - 1]
        weights = np.where(assigned >= 0, 1.0, 0.0)  # -1 = ignore
        loss_cls += focal_oracle(cls[i], labels, weights, num_classes)
        if len(pos_inds):
            pa = anchors[pos_inds]
            pgt = gts_list[i][assigned[pos_inds] - 1]
            t = delta_encode_np(pa, pgt)
            d = np.abs(reg[i][pos_inds] - t)
            sl1 = np.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
            loss_bbox += sl1.sum()
    return dict(
        loss_cls=loss_cls / num_total_samples,
        loss_bbox=loss_bbox / num_total_samples,
    )


# ------------------------------------------------------------------ tests


def _setup(seed, num_classes=4, b=2, g=3, img=(64, 64)):
    rng = np.random.RandomState(seed)
    gen = AnchorGenerator(strides=[8, 16, 32], ratios=[1.0],
                          octave_base_scale=6, scales_per_octave=1)
    anchors, _, counts = flat_anchors_for_input(gen, img)
    n = anchors.shape[0]
    cls = rng.randn(b, n, num_classes).astype(np.float32)
    reg = (rng.randn(b, n, 4) * 0.2).astype(np.float32)
    ctr = rng.randn(b, n).astype(np.float32)
    gts_list, labels_list = [], []
    max_gt = g + 1
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    for i in range(b):
        boxes = rng.uniform(0, 40, (g, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 24, (g, 2))
        labels = rng.randint(0, num_classes, g)
        gts_list.append(boxes)
        labels_list.append(labels)
        gt_boxes[i, :g] = boxes
        gt_labels[i, :g] = labels
        gt_valid[i, :g] = True
    return (anchors, counts, cls, reg, ctr, gts_list, labels_list,
            gt_boxes, gt_labels, gt_valid)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("quality", ["centerness", "iou"])
def test_atss_loss_matches_oracle(seed, quality):
    num_classes = 4
    (anchors, counts, cls, reg, ctr, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(seed, num_classes)
    expected = atss_loss_oracle(cls, reg, ctr, anchors, counts, gts_list,
                                labels_list, num_classes, quality=quality)
    # oracle encodes with unit stds — use the unit-std coder (the ATSS
    # reference config's target_stds are (0.1,...) but the oracle/impl pair
    # must share one coder; the coder itself is round-trip tested separately)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))
    got = atss_loss(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(ctr),
        jnp.asarray(anchors), tuple(counts),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        num_classes=num_classes, encode_fn=enc, decode_fn=dec,
        quality=quality,
    )
    np.testing.assert_allclose(float(got["loss_cls"]), expected["loss_cls"],
                               rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_bbox"]), expected["loss_bbox"],
                               rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_centerness"]),
                               expected["loss_centerness"], rtol=2e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_anchor_head_loss_matches_oracle(seed):
    num_classes = 4
    (anchors, counts, cls, reg, _, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(seed, num_classes)
    expected = anchor_loss_oracle(cls, reg, anchors, gts_list, labels_list,
                                  num_classes)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))
    got = anchor_head_loss(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        num_classes=num_classes, encode_fn=enc, decode_fn=dec,
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
    )
    np.testing.assert_allclose(float(got["loss_cls"]), expected["loss_cls"],
                               rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_bbox"]), expected["loss_bbox"],
                               rtol=2e-4)


def test_atss_loss_no_positives_finite():
    num_classes = 4
    (anchors, counts, cls, reg, ctr, *_,) = _setup(5, num_classes)
    b, n, _ = cls.shape
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))
    got = atss_loss(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(ctr),
        jnp.asarray(anchors), tuple(counts),
        jnp.zeros((b, 4, 4)), jnp.zeros((b, 4), jnp.int32),
        jnp.zeros((b, 4), bool),
        num_classes=num_classes, encode_fn=enc, decode_fn=dec,
    )
    for k, v in got.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(got["num_pos"]) == 0


def test_anchor_head_loss_gradients_finite():
    num_classes = 4
    (anchors, counts, cls, reg, _, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(3, num_classes)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))

    def f(c, r):
        out = anchor_head_loss(
            c, r, jnp.asarray(anchors), jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels), jnp.asarray(gt_valid),
            num_classes=num_classes, encode_fn=enc, decode_fn=dec,
        )
        return out["loss_cls"] + out["loss_bbox"]

    gc, gr = jax.grad(f, argnums=(0, 1))(jnp.asarray(cls), jnp.asarray(reg))
    assert np.isfinite(np.asarray(gc)).all()
    assert np.isfinite(np.asarray(gr)).all()


# ------------------------------------------------------- RandomSampler


def _random_sampler_oracle(rs, pos_idx, neg_idx, num, pos_fraction, neg_pos_ub):
    """mmdet BaseSampler.sample + RandomSampler.random_choice COUNTING
    semantics (base_sampler.py:59-103): the chosen indices are random, so
    the oracle pins the exact set SIZES and the subset property."""
    num_expected_pos = int(num * pos_fraction)
    n_pos = min(len(pos_idx), num_expected_pos)
    num_expected_neg = num - n_pos
    if neg_pos_ub >= 0:
        num_expected_neg = min(num_expected_neg, int(neg_pos_ub * max(1, n_pos)))
    n_neg = min(len(neg_idx), num_expected_neg)
    return n_pos, n_neg


@pytest.mark.parametrize(
    "num,pos_fraction,neg_pos_ub",
    [(64, 0.5, -1.0), (8, 0.25, -1.0), (64, 0.5, 3.0), (256, 0.5, -1.0)],
)
def test_random_sample_masks_counts_and_subset(num, pos_fraction, neg_pos_ub):
    from radet_tpu.models.anchor_loss import random_sample_masks

    rs = np.random.RandomState(0)
    n = 400
    for seed in range(4):
        pos = jnp.asarray(rs.rand(n) < 0.15)
        neg = jnp.asarray(~np.asarray(pos) & (rs.rand(n) < 0.7))
        pos_s, neg_s = random_sample_masks(
            jax.random.PRNGKey(seed), pos, neg,
            num=num, pos_fraction=pos_fraction, neg_pos_ub=neg_pos_ub,
        )
        assert not np.any(np.asarray(pos_s) & ~np.asarray(pos))
        assert not np.any(np.asarray(neg_s) & ~np.asarray(neg))
        e_pos, e_neg = _random_sampler_oracle(
            rs, np.where(np.asarray(pos))[0], np.where(np.asarray(neg))[0],
            num, pos_fraction, neg_pos_ub,
        )
        assert int(pos_s.sum()) == e_pos, (int(pos_s.sum()), e_pos)
        assert int(neg_s.sum()) == e_neg, (int(neg_s.sum()), e_neg)


def test_random_sampler_uniform_over_members():
    """Every positive is selected with ~equal frequency (uniform without
    replacement): 20 of 40 positives kept over 300 keys -> each ~50%."""
    from radet_tpu.models.anchor_loss import random_sample_masks

    rs = np.random.RandomState(1)
    n = 200
    pos = np.zeros(n, bool)
    pos[rs.choice(n, 40, replace=False)] = True
    neg = ~pos
    counts = np.zeros(n)
    trials = 300
    for s in range(trials):
        pos_s, _ = random_sample_masks(
            jax.random.PRNGKey(s), jnp.asarray(pos), jnp.asarray(neg),
            num=40, pos_fraction=0.5, neg_pos_ub=-1.0,
        )
        counts += np.asarray(pos_s)
    freq = counts[pos] / trials
    assert abs(freq.mean() - 0.5) < 0.01
    # 3-sigma binomial band around 0.5
    assert freq.min() > 0.5 - 3 * np.sqrt(0.25 / trials) - 0.02
    assert freq.max() < 0.5 + 3 * np.sqrt(0.25 / trials) + 0.02


def test_anchor_head_loss_big_sampler_equals_pseudo():
    """Quotas larger than both sets keep everything -> BITWISE equal to the
    PseudoSampler path (same targets, weights, and normalizers)."""
    num_classes = 4
    (anchors, counts, cls, reg, _, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(7, num_classes)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))
    kw = dict(
        num_classes=num_classes, encode_fn=enc, decode_fn=dec,
        cls_loss="CrossEntropyLoss",
    )
    base = anchor_head_loss(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        **kw,
    )
    sampled = anchor_head_loss(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        sampler_num=10**6, sampler_pos_fraction=1.0, sampler_neg_pos_ub=-1.0,
        rng=jax.random.PRNGKey(0), **kw,
    )
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(sampled[k]))


def test_anchor_head_loss_rpn_style_sampler():
    """RPN-style recipe (CE loss + RandomSampler(num=256, 0.5)): the loss is
    finite, differentiates, and the positive count obeys the quota."""
    num_classes = 1
    (anchors, counts, cls, reg, _, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(9, num_classes)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))

    def f(c, r):
        out = anchor_head_loss(
            c, r, jnp.asarray(anchors), jnp.asarray(gt_boxes),
            jnp.asarray(jnp.zeros_like(gt_labels)), jnp.asarray(gt_valid),
            num_classes=num_classes, encode_fn=enc, decode_fn=dec,
            cls_loss="CrossEntropyLoss",
            sampler_num=256, sampler_pos_fraction=0.5, sampler_neg_pos_ub=-1.0,
            rng=jax.random.PRNGKey(3),
        )
        return out["loss_cls"] + out["loss_bbox"], out

    (total, out), (gc, gr) = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        jnp.asarray(cls), jnp.asarray(reg)
    )
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(gc)).all() and np.isfinite(np.asarray(gr)).all()


def test_sampler_rejected_under_focal_loss():
    """mmdet ignores train_cfg.sampler under FocalLoss; passing one through
    the loss directly is a programming error and must fail fast."""
    num_classes = 4
    (anchors, counts, cls, reg, _, gts_list, labels_list,
     gt_boxes, gt_labels, gt_valid) = _setup(2, num_classes)
    enc, dec = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder"))
    with pytest.raises(AssertionError, match="sampling losses"):
        anchor_head_loss(
            jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
            num_classes=num_classes, encode_fn=enc, decode_fn=dec,
            cls_loss="FocalLoss", sampler_num=256, rng=jax.random.PRNGKey(0),
        )
