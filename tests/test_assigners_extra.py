"""Residual assigner zoo parity vs sequential numpy oracles.

Each oracle transcribes the reference torch loop step-for-step
(/root/reference/radet/core/bbox/assigners/{grid,point,center_region,
region,approx_max_iou,hungarian}_assigner.py, match_costs/match_cost.py)
in plain numpy — labeled semantic transcriptions serving as the
differential spec for the vectorized on-device forms in
radet_tpu/core/assigners_extra.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core.assigners_extra import (
    approx_max_iou_assign,
    bbox_l1_cost,
    center_region_assign,
    classification_cost,
    cxcywh_to_xyxy,
    focal_loss_cost,
    grid_assign,
    hungarian_assign,
    hungarian_matching,
    iou_cost,
    point_assign,
    region_assign,
)

MAX_GT = 8


def _iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def _iof(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None], 1e-6)


def _pad_gts(gts, labels=None, max_gt=MAX_GT):
    g = len(gts)
    out = np.zeros((max_gt, 4), np.float32)
    out[:g] = gts
    valid = np.zeros(max_gt, bool)
    valid[:g] = True
    if labels is None:
        return out, valid
    lab = np.zeros(max_gt, np.int32)
    lab[:g] = labels
    return out, lab, valid


def _boxes(rng, n, lo=0, hi=100, min_side=2, max_side=40):
    xy = rng.uniform(lo, hi - max_side, (n, 2))
    wh = rng.uniform(min_side, max_side, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# GridAssigner
# ---------------------------------------------------------------------------


def grid_oracle(bboxes, resp, gts, pos_thr, neg_thr, min_pos_iou=0.0,
                gt_max_assign_all=True):
    """Transcription of GridAssigner.assign (grid_assigner.py:42-155)."""
    overlaps = _iou(gts, bboxes)
    num_gts, n = overlaps.shape
    assigned = np.full(n, -1, np.int64)
    if num_gts == 0:
        return np.zeros(n, np.int64), np.zeros(n)
    max_o = overlaps.max(0)
    if isinstance(neg_thr, float):
        assigned[(max_o >= 0) & (max_o <= neg_thr)] = 0
    else:
        assigned[(max_o > neg_thr[0]) & (max_o <= neg_thr[1])] = 0
    ov = overlaps.copy()
    ov[:, ~resp] = -1.0
    max_o2 = ov.max(0)
    argmax2 = ov.argmax(0)
    gt_max = ov.max(1)
    gt_argmax = ov.argmax(1)
    pos = (max_o2 > pos_thr) & resp
    assigned[pos] = argmax2[pos] + 1
    for i in range(num_gts):
        if gt_max[i] > min_pos_iou:
            if gt_max_assign_all:
                assigned[(ov[i] == gt_max[i]) & resp] = i + 1
            elif resp[gt_argmax[i]]:
                assigned[gt_argmax[i]] = i + 1
    # AssignResult carries the masked max recomputed after the resp mask
    # (grid_assigner.py:118-122)
    return assigned, max_o2


@pytest.mark.parametrize("neg_thr", [0.3, (0.1, 0.3)])
@pytest.mark.parametrize("gt_max_assign_all", [True, False])
@pytest.mark.parametrize("min_pos_iou", [0.0, 0.1])
def test_grid_assign_vs_oracle(neg_thr, gt_max_assign_all, min_pos_iou):
    rng = np.random.RandomState(3)
    for trial in range(4):
        n, g = 120, rng.randint(1, 6)
        bboxes = _boxes(rng, n)
        gts = _boxes(rng, g)
        resp = rng.rand(n) < 0.6
        want, want_ov = grid_oracle(bboxes, resp, gts, 0.5, neg_thr,
                                    min_pos_iou, gt_max_assign_all)
        gts_p, valid = _pad_gts(gts)
        got, got_ov = grid_assign(
            jnp.asarray(bboxes), jnp.asarray(resp), jnp.asarray(gts_p),
            jnp.asarray(valid), pos_iou_thr=0.5, neg_iou_thr=neg_thr,
            min_pos_iou=min_pos_iou, gt_max_assign_all=gt_max_assign_all,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str(trial))
        np.testing.assert_allclose(np.asarray(got_ov), want_ov, atol=1e-6,
                                   err_msg=f"masked max_overlaps {trial}")


def test_grid_assign_no_gt_all_background():
    rng = np.random.RandomState(0)
    bboxes = _boxes(rng, 30)
    gts_p, valid = _pad_gts(np.zeros((0, 4), np.float32))
    got, _ = grid_assign(
        jnp.asarray(bboxes), jnp.ones(30, bool), jnp.asarray(gts_p),
        jnp.asarray(valid), pos_iou_thr=0.5, neg_iou_thr=0.3,
    )
    np.testing.assert_array_equal(np.asarray(got), np.zeros(30))


# ---------------------------------------------------------------------------
# PointAssigner
# ---------------------------------------------------------------------------


def point_oracle(points, gts, scale, pos_num):
    """Transcription of PointAssigner.assign (point_assigner.py:23-133)."""
    n = len(points)
    g = len(gts)
    if g == 0:
        return np.zeros(n, np.int64)
    xy = points[:, :2]
    lvl = np.log2(points[:, 2]).astype(np.int64)
    lvl_min, lvl_max = lvl.min(), lvl.max()
    gt_xy = (gts[:, :2] + gts[:, 2:]) / 2
    gt_wh = np.clip(gts[:, 2:] - gts[:, :2], 1e-6, None)
    gt_lvl = np.trunc(
        (np.log2(gt_wh[:, 0] / scale) + np.log2(gt_wh[:, 1] / scale)) / 2
    ).astype(np.int64)
    gt_lvl = np.clip(gt_lvl, lvl_min, lvl_max)
    assigned = np.zeros(n, np.int64)
    assigned_dist = np.full(n, np.inf)
    pr = np.arange(n)
    for idx in range(g):
        mask = gt_lvl[idx] == lvl
        pidx = pr[mask]
        d = np.linalg.norm((xy[mask] - gt_xy[idx]) / gt_wh[idx], axis=1)
        k = min(pos_num, len(d))
        order = np.argsort(d, kind="stable")[:k]
        min_dist, min_idx = d[order], pidx[order]
        better = min_dist < assigned_dist[min_idx]
        assigned[min_idx[better]] = idx + 1
        assigned_dist[min_idx[better]] = min_dist[better]
    return assigned


@pytest.mark.parametrize("scale,pos_num", [(4, 3), (4, 1), (8, 5)])
def test_point_assign_vs_oracle(scale, pos_num):
    rng = np.random.RandomState(11)
    # multi-level point set (x, y, stride), strides 8/16/32
    pts = []
    for stride in (8, 16, 32):
        c = np.arange(0, 96, stride) + stride / 2
        gx, gy = np.meshgrid(c, c)
        pts.append(
            np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, stride)], axis=1)
        )
    points = np.concatenate(pts).astype(np.float32)
    for trial in range(5):
        g = rng.randint(1, 7)
        gts = _boxes(rng, g, hi=96, min_side=6, max_side=70)
        want = point_oracle(points, gts, scale, pos_num)
        gts_p, valid = _pad_gts(gts)
        got = point_assign(
            jnp.asarray(points), jnp.asarray(gts_p), jnp.asarray(valid),
            scale=scale, pos_num=pos_num,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str(trial))


# ---------------------------------------------------------------------------
# CenterRegionAssigner
# ---------------------------------------------------------------------------


def center_region_oracle(bboxes, gts, labels, pos_scale, neg_scale,
                         min_pos_iof=1e-2, foreground_dominate=False):
    """Transcription of CenterRegionAssigner.assign (:125-335). Returns
    (assigned 1-based, set of shadowed (pixel, gt0) pairs)."""
    def scale_np(b, s):
        c = (b[:, :2] + b[:, 2:]) / 2
        half = (b[:, 2:] - b[:, :2]) / 2 * s
        return np.concatenate([c - half, c + half], axis=1)

    n, g = len(bboxes), len(gts)
    if g == 0:
        return np.zeros(n, np.int64), set()
    core = scale_np(gts, pos_scale)
    shadow_r = scale_np(gts, neg_scale)
    centers = (bboxes[:, :2] + bboxes[:, 2:]) / 2
    in_gt = (
        (centers[:, 0:1] > gts[None, :, 0])
        & (centers[:, 0:1] < gts[None, :, 2])
        & (centers[:, 1:2] > gts[None, :, 1])
        & (centers[:, 1:2] < gts[None, :, 3])
    )
    in_core = in_gt & (_iof(bboxes, core) > min_pos_iof)
    in_shadow = (_iof(bboxes, shadow_r) > min_pos_iof) & ~in_core

    areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    sort_idx = np.argsort(-areas, kind="stable")
    priority = np.argsort(sort_idx, kind="stable")  # rank; smaller area higher

    assigned = np.zeros(n, np.int64)
    shadow_pairs = set(map(tuple, np.argwhere(in_shadow)))
    if in_core.sum() > 0:
        pair_p = np.full((n, g), -1, np.int64)
        pair_p[in_core] = priority[np.argwhere(in_core)[:, 1]]
        match = in_core.any(1)
        chosen = pair_p[match].argmax(1)
        assigned[match] = chosen + 1
        core2 = in_core.copy()
        core2[np.where(match)[0], chosen] = False
        shadow_pairs |= set(map(tuple, np.argwhere(core2)))
    # label step (:237-250)
    assigned_labels = np.full(n, -1, np.int64)
    pos = assigned > 0
    assigned_labels[pos] = labels[assigned[pos] - 1]
    drop, demote = set(), set()
    for (p, gi) in sorted(shadow_pairs):
        if labels[gi] == assigned_labels[p]:
            if foreground_dominate:
                drop.add((p, gi))
            else:
                demote.add(p)
    if foreground_dominate:
        shadow_pairs -= drop
    else:
        for p in demote:
            assigned[p] = 0
    return assigned, shadow_pairs


@pytest.mark.parametrize("foreground_dominate", [False, True])
def test_center_region_assign_vs_oracle(foreground_dominate):
    rng = np.random.RandomState(5)
    for trial in range(5):
        n, g = 150, rng.randint(1, 6)
        bboxes = _boxes(rng, n, max_side=12)
        gts = _boxes(rng, g, min_side=10, max_side=60)
        labels = rng.randint(0, 3, g)
        want, want_shadow = center_region_oracle(
            bboxes, gts, labels, 0.2, 0.5,
            foreground_dominate=foreground_dominate,
        )
        gts_p, lab_p, valid = _pad_gts(gts, labels)
        got, got_shadow = center_region_assign(
            jnp.asarray(bboxes), jnp.asarray(gts_p), jnp.asarray(lab_p),
            jnp.asarray(valid), pos_scale=0.2, neg_scale=0.5,
            foreground_dominate=foreground_dominate,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str(trial))
        got_pairs = set(map(tuple, np.argwhere(np.asarray(got_shadow))))
        assert got_pairs == want_shadow, trial


# ---------------------------------------------------------------------------
# RegionAssigner
# ---------------------------------------------------------------------------


def region_oracle(mlvl_anchors, featmap_sizes, strides, gts, anchor_scale,
                  center_ratio=0.2, ignore_ratio=0.5):
    """Transcription of RegionAssigner.assign (region_assigner.py:58-221),
    minus the trailing valid-flags step (exercised via inside_mask)."""
    def calc_region(bbox, ratio, stride, fs):
        f = bbox / stride
        x1 = np.clip(np.round((1 - ratio) * f[0] + ratio * f[2]), 0, fs[1])
        y1 = np.clip(np.round((1 - ratio) * f[1] + ratio * f[3]), 0, fs[0])
        x2 = np.clip(np.round(ratio * f[0] + (1 - ratio) * f[2]), 0, fs[1])
        y2 = np.clip(np.round(ratio * f[1] + (1 - ratio) * f[3]), 0, fs[0])
        return x1, y1, x2, y2

    def ctr_flags(anchors, stride, region):
        x1, y1, x2, y2 = region
        f = anchors / stride
        x = (f[:, 0] + f[:, 2]) * 0.5
        y = (f[:, 1] + f[:, 3]) * 0.5
        return (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)

    num_lvls = len(mlvl_anchors)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = np.sqrt((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
    min_size = float(anchor_scale * strides[0])
    target = np.clip(
        np.floor(np.log2(scale) - np.log2(min_size) + 0.5), 0, num_lvls - 1
    ).astype(np.int64)
    assigned = [np.zeros(len(a), np.int64) for a in mlvl_anchors]
    ignore = [np.zeros(len(a), bool) for a in mlvl_anchors]
    for gid in range(len(gts)):
        lvl = target[gid]
        ign = calc_region(gts[gid], r2, strides[lvl], featmap_sizes[lvl])
        ctr = calc_region(gts[gid], r1, strides[lvl], featmap_sizes[lvl])
        assigned[lvl][ctr_flags(mlvl_anchors[lvl], strides[lvl], ign)] = -1
        assigned[lvl][ctr_flags(mlvl_anchors[lvl], strides[lvl], ctr)] = gid + 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < num_lvls:
                ignd = calc_region(gts[gid], r2, strides[d], featmap_sizes[d])
                ignore[d] |= ctr_flags(mlvl_anchors[d], strides[d], ignd)
    for lvl in range(num_lvls):
        assigned[lvl][ignore[lvl]] = -1
    return np.concatenate(assigned)


def test_region_assign_vs_oracle():
    rng = np.random.RandomState(7)
    strides = (8, 16, 32)
    featmap_sizes = [(12, 16), (6, 8), (3, 4)]
    mlvl = []
    for (h, w), s in zip(featmap_sizes, strides):
        cx, cy = np.meshgrid(np.arange(w) * s + s / 2, np.arange(h) * s + s / 2)
        half = s * 4 / 2
        mlvl.append(
            np.stack(
                [cx.ravel() - half, cy.ravel() - half,
                 cx.ravel() + half, cy.ravel() + half], axis=1
            ).astype(np.float32)
        )
    flat = np.concatenate(mlvl)
    counts = [len(a) for a in mlvl]
    for trial in range(6):
        g = rng.randint(1, 6)
        gts = _boxes(rng, g, hi=128, min_side=8, max_side=110)
        want = region_oracle(mlvl, featmap_sizes, strides, gts, anchor_scale=4)
        gts_p, valid = _pad_gts(gts)
        got = region_assign(
            jnp.asarray(flat), counts, featmap_sizes, strides,
            jnp.asarray(gts_p), jnp.asarray(valid),
            center_ratio=0.2, ignore_ratio=0.5, anchor_scale=4,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str(trial))


def test_region_assign_inside_mask_overwrites():
    rng = np.random.RandomState(1)
    strides = (8,)
    featmap_sizes = [(8, 8)]
    s = 8
    cx, cy = np.meshgrid(np.arange(8) * s + 4, np.arange(8) * s + 4)
    anchors = np.stack(
        [cx.ravel() - 16, cy.ravel() - 16, cx.ravel() + 16, cy.ravel() + 16],
        axis=1,
    ).astype(np.float32)
    gts_p, valid = _pad_gts(np.asarray([[8, 8, 50, 50]], np.float32))
    mask = np.zeros(64, bool)
    mask[:32] = True
    got = region_assign(
        jnp.asarray(anchors), [64], featmap_sizes, strides,
        jnp.asarray(gts_p), jnp.asarray(valid),
        anchor_scale=4, inside_mask=jnp.asarray(mask),
    )
    assert (np.asarray(got)[~mask] == -1).all()


# ---------------------------------------------------------------------------
# ApproxMaxIoUAssigner
# ---------------------------------------------------------------------------


def approx_oracle(approxs, gts, pos_thr, neg_thr, min_pos_iou=0.0,
                  gt_max_assign_all=True, match_low_quality=True):
    """Transcription of ApproxMaxIoUAssigner.assign (:63-145) + the MaxIoU
    assign_wrt_overlaps core it delegates to."""
    a, n = approxs.shape[:2]
    all_ov = _iou(gts, approxs.reshape(-1, 4))  # (G, A*N)
    overlaps = all_ov.reshape(len(gts), a, n).max(axis=1)
    num_gts = len(gts)
    assigned = np.full(n, -1, np.int64)
    if num_gts == 0:
        return np.zeros(n, np.int64)
    max_o = overlaps.max(0)
    argmax_o = overlaps.argmax(0)
    gt_max = overlaps.max(1)
    gt_argmax = overlaps.argmax(1)
    if isinstance(neg_thr, tuple):
        assigned[(max_o >= neg_thr[0]) & (max_o < neg_thr[1])] = 0
    else:
        assigned[(max_o >= 0) & (max_o < neg_thr)] = 0
    pos = max_o >= pos_thr
    assigned[pos] = argmax_o[pos] + 1
    if match_low_quality:
        for i in range(num_gts):
            if gt_max[i] >= min_pos_iou:
                if gt_max_assign_all:
                    assigned[overlaps[i] == gt_max[i]] = i + 1
                else:
                    assigned[gt_argmax[i]] = i + 1
    return assigned


@pytest.mark.parametrize("gt_max_assign_all", [True, False])
def test_approx_max_iou_assign_vs_oracle(gt_max_assign_all):
    rng = np.random.RandomState(13)
    for trial in range(4):
        n, a, g = 80, 3, rng.randint(1, 6)
        squares = _boxes(rng, n)
        # octave approxs: jittered variants of each square
        approxs = np.stack(
            [squares + rng.uniform(-4, 4, squares.shape).astype(np.float32)
             for _ in range(a)]
        )
        gts = _boxes(rng, g)
        want = approx_oracle(approxs, gts, 0.5, 0.4,
                             min_pos_iou=0.1, gt_max_assign_all=gt_max_assign_all)
        gts_p, valid = _pad_gts(gts)
        got, _ = approx_max_iou_assign(
            jnp.asarray(approxs), jnp.asarray(gts_p), jnp.asarray(valid),
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.1,
            gt_max_assign_all=gt_max_assign_all,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str(trial))


# ---------------------------------------------------------------------------
# Match costs + HungarianAssigner
# ---------------------------------------------------------------------------


def test_iou_cost_reference_docstring_golden():
    """The reference IoUCost docstring example (match_cost.py:152-161)."""
    bboxes = jnp.asarray([[1.0, 1, 2, 2], [2, 2, 3, 4]])
    gts = jnp.asarray([[0.0, 0, 2, 4], [1, 2, 3, 4]])
    got = np.asarray(iou_cost(bboxes, gts, weight=1.0, iou_mode="giou"))
    np.testing.assert_allclose(
        got, [[-0.1250, 0.1667], [0.1667, -0.5000]], atol=1e-4
    )


def test_match_costs_vs_numpy_transcriptions():
    rng = np.random.RandomState(17)
    q, c, g = 12, 5, 4
    logits = rng.randn(q, c).astype(np.float32)
    labels = rng.randint(0, c, g)
    # ClassificationCost: -softmax[labels]
    sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(classification_cost(jnp.asarray(logits), jnp.asarray(labels), 2.0)),
        -sm[:, labels] * 2.0, rtol=1e-5,
    )
    # FocalLossCost
    p = 1 / (1 + np.exp(-logits))
    eps, alpha, gamma = 1e-12, 0.25, 2.0
    neg = -np.log(1 - p + eps) * (1 - alpha) * p**gamma
    pos = -np.log(p + eps) * alpha * (1 - p) ** gamma
    np.testing.assert_allclose(
        np.asarray(focal_loss_cost(jnp.asarray(logits), jnp.asarray(labels), 1.5)),
        (pos[:, labels] - neg[:, labels]) * 1.5, rtol=1e-5,
    )
    # BBoxL1Cost xyxy: cdist(pred_xyxy, gt_xyxy, p=1)
    pred = rng.rand(q, 4).astype(np.float32) * 0.5
    pred[:, 2:] += 0.1
    gt = np.sort(rng.rand(g, 4).astype(np.float32), axis=-1)
    px = np.asarray(cxcywh_to_xyxy(jnp.asarray(pred)))
    want = np.abs(px[:, None] - gt[None]).sum(-1)
    np.testing.assert_allclose(
        np.asarray(bbox_l1_cost(jnp.asarray(pred), jnp.asarray(gt), 1.0, "xyxy")),
        want, rtol=1e-5, atol=1e-6,
    )
    # xywh format: gt converted to cxcywh
    gtc = np.concatenate([(gt[:, :2] + gt[:, 2:]) / 2, gt[:, 2:] - gt[:, :2]], 1)
    want = np.abs(pred[:, None] - gtc[None]).sum(-1)
    np.testing.assert_allclose(
        np.asarray(bbox_l1_cost(jnp.asarray(pred), jnp.asarray(gt), 1.0, "xywh")),
        want, rtol=1e-5, atol=1e-6,
    )


def test_hungarian_matching_optimal_vs_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(19)
    for trial in range(8):
        g = rng.randint(1, MAX_GT + 1)
        q = rng.randint(g, 40)
        cost = rng.randn(MAX_GT, q).astype(np.float32) * 3
        valid = np.zeros(MAX_GT, bool)
        valid[:g] = True
        col4row = np.asarray(
            hungarian_matching(jnp.asarray(cost), jnp.asarray(valid))
        )
        # one-to-one over ALL rows (padded rows also get distinct columns)
        assert len(set(col4row.tolist())) == MAX_GT, trial
        rows, cols = linear_sum_assignment(cost[:g])
        want_total = cost[rows, cols].sum()
        got_total = cost[np.arange(g), col4row[:g]].sum()
        # equal optimal value (ties may pick a different argmin matching)
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-4)


def test_hungarian_assign_matches_scipy_pipeline():
    """Full assign parity: same costs -> scipy matching -> same 0/g+1
    encoding, on tie-free random instances."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(23)
    h, w = 100.0, 120.0
    for trial in range(5):
        q, c = 25, 6
        g = rng.randint(1, MAX_GT + 1)
        logits = rng.randn(q, c).astype(np.float32)
        pred = np.concatenate(
            [rng.uniform(0.2, 0.8, (q, 2)), rng.uniform(0.05, 0.3, (q, 2))],
            axis=1,
        ).astype(np.float32)
        gts = _boxes(rng, g, hi=100, min_side=5, max_side=50)
        labels = rng.randint(0, c, g)
        gts_p, lab_p, valid = _pad_gts(gts, labels)
        assigned, alabels = hungarian_assign(
            jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gts_p),
            jnp.asarray(lab_p), jnp.asarray(valid), (h, w),
        )
        assigned = np.asarray(assigned)
        # numpy cost pipeline (transcribing hungarian_assigner.py:115-131)
        factor = np.asarray([w, h, w, h], np.float32)
        sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        c_cls = -sm[:, labels]
        gt_n = gts / factor
        px = np.asarray(cxcywh_to_xyxy(jnp.asarray(pred)))
        c_reg = np.abs(px[:, None] - gt_n[None]).sum(-1)
        c_iou = np.asarray(
            iou_cost(jnp.asarray(px * factor), jnp.asarray(gts), 1.0, "giou")
        )
        cost = c_cls + c_reg + c_iou
        rows, cols = linear_sum_assignment(cost)
        want = np.zeros(q, np.int64)
        want[rows] = cols + 1
        np.testing.assert_array_equal(assigned, want, err_msg=str(trial))
        # labels: matched queries carry the gt label, others -1
        want_lab = np.full(q, -1, np.int64)
        want_lab[rows] = labels[cols]
        np.testing.assert_array_equal(np.asarray(alabels), want_lab)


def test_hungarian_assign_no_gt_all_background():
    rng = np.random.RandomState(2)
    q = 10
    logits = rng.randn(q, 4).astype(np.float32)
    pred = np.full((q, 4), 0.5, np.float32)
    gts_p, lab_p, valid = _pad_gts(
        np.zeros((0, 4), np.float32), np.zeros(0, np.int64)
    )
    assigned, alabels = hungarian_assign(
        jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gts_p),
        jnp.asarray(lab_p), jnp.asarray(valid), (64.0, 64.0),
    )
    np.testing.assert_array_equal(np.asarray(assigned), np.zeros(q))


# ---------------------------------------------------------------------------
# Padding invariance: every assigner ignores the padded GT slots entirely
# ---------------------------------------------------------------------------


def test_padding_invariance_across_assigners():
    rng = np.random.RandomState(29)
    n, g = 60, 3
    bboxes = _boxes(rng, n)
    gts = _boxes(rng, g)
    labels = rng.randint(0, 4, g)
    for max_gt in (g, MAX_GT, 2 * MAX_GT):
        gts_p, lab_p, valid = _pad_gts(gts, labels, max_gt)
        a1, _ = grid_assign(
            jnp.asarray(bboxes), jnp.ones(n, bool), jnp.asarray(gts_p),
            jnp.asarray(valid), pos_iou_thr=0.5, neg_iou_thr=0.3,
        )
        a2, s2 = center_region_assign(
            jnp.asarray(bboxes), jnp.asarray(gts_p), jnp.asarray(lab_p),
            jnp.asarray(valid), pos_scale=0.2, neg_scale=0.5,
        )
        if max_gt == g:
            base = (np.asarray(a1), np.asarray(a2),
                    np.asarray(s2)[:, :g].copy())
        else:
            np.testing.assert_array_equal(np.asarray(a1), base[0])
            np.testing.assert_array_equal(np.asarray(a2), base[1])
            s = np.asarray(s2)
            np.testing.assert_array_equal(s[:, :g], base[2])
            assert not s[:, g:].any()
