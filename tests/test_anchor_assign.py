"""MaxIoU / ATSS assigner parity vs sequential numpy oracles.

The oracles transcribe the reference algorithms step-for-step
(/root/reference/radet/core/bbox/assigners/max_iou_assigner.py:127-212,
atss_assigner.py:33-178) in plain numpy loops — labeled semantic
transcriptions serving as the differential spec for the vectorized
on-device implementations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core.anchor_assign import atss_assign, max_iou_assign
from radet_tpu.core.anchor_generator import AnchorGenerator, flat_anchors_for_input


def _iou(a, b):
    """Pairwise IoU (G, N) in numpy."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-6)


def max_iou_oracle(bboxes, gts, pos_thr, neg_thr, min_pos_iou=0.0,
                   gt_max_assign_all=True, match_low_quality=True):
    """Sequential transcription of assign_wrt_overlaps (:127-212)."""
    overlaps = _iou(gts, bboxes)  # (G, N)
    num_gts, num_bboxes = overlaps.shape
    assigned = np.full(num_bboxes, -1, np.int64)
    if num_gts == 0:
        return np.zeros(num_bboxes, np.int64)
    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)
    gt_max_overlaps = overlaps.max(axis=1)
    gt_argmax_overlaps = overlaps.argmax(axis=1)
    if isinstance(neg_thr, tuple):
        assigned[(max_overlaps >= neg_thr[0]) & (max_overlaps < neg_thr[1])] = 0
    else:
        assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax_overlaps[pos] + 1
    if match_low_quality:
        for i in range(num_gts):
            if gt_max_overlaps[i] >= min_pos_iou:
                if gt_max_assign_all:
                    assigned[overlaps[i] == gt_max_overlaps[i]] = i + 1
                else:
                    assigned[gt_argmax_overlaps[i]] = i + 1
    return assigned


def atss_oracle(bboxes, num_level_bboxes, gts, topk):
    """Sequential transcription of ATSSAssigner.assign (:33-178)."""
    INF = 100000000
    num_gt, num_bboxes = len(gts), len(bboxes)
    overlaps = _iou(bboxes, gts)  # (N, G)
    assigned = np.zeros(num_bboxes, np.int64)
    if num_gt == 0:
        return assigned
    gt_c = np.stack(
        [(gts[:, 0] + gts[:, 2]) / 2, (gts[:, 1] + gts[:, 3]) / 2], axis=1
    )
    a_c = np.stack(
        [(bboxes[:, 0] + bboxes[:, 2]) / 2, (bboxes[:, 1] + bboxes[:, 3]) / 2],
        axis=1,
    )
    distances = np.sqrt(((a_c[:, None] - gt_c[None]) ** 2).sum(-1))
    cand_idx = []
    start = 0
    for n_l in num_level_bboxes:
        k = min(topk, n_l)
        d = distances[start : start + n_l]
        idx = np.argsort(d, axis=0, kind="stable")[:k]
        cand_idx.append(idx + start)
        start += n_l
    cand_idx = np.concatenate(cand_idx, axis=0)  # (C, G)
    cand_overlaps = np.take_along_axis(overlaps, cand_idx, axis=0)
    thr = cand_overlaps.mean(0) + cand_overlaps.std(0, ddof=1)
    is_pos = cand_overlaps >= thr[None, :]
    for gi in range(num_gt):
        cxs = a_c[cand_idx[:, gi], 0]
        cys = a_c[cand_idx[:, gi], 1]
        in_gt = (
            np.minimum(
                np.minimum(cxs - gts[gi, 0], gts[gi, 2] - cxs),
                np.minimum(cys - gts[gi, 1], gts[gi, 3] - cys),
            )
            > 0.01
        )
        is_pos[:, gi] &= in_gt
    overlaps_inf = np.full_like(overlaps, -INF)
    for gi in range(num_gt):
        sel = cand_idx[is_pos[:, gi], gi]
        overlaps_inf[sel, gi] = overlaps[sel, gi]
    best = overlaps_inf.max(axis=1)
    best_gt = overlaps_inf.argmax(axis=1)
    assigned[best != -INF] = best_gt[best != -INF] + 1
    return assigned


def _random_boxes(rng, n, lo=0, hi=200, min_wh=4, max_wh=80):
    b = rng.uniform(lo, hi, (n, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(min_wh, max_wh, (n, 2))
    return b


def _pad_gts(gts, max_gt):
    g = len(gts)
    out = np.zeros((max_gt, 4), np.float32)
    out[:g] = gts
    valid = np.zeros(max_gt, bool)
    valid[:g] = True
    return out, valid


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        dict(pos_iou_thr=0.7, neg_iou_thr=(0.1, 0.3), min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.2,
             gt_max_assign_all=False),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.3, match_low_quality=False),
    ],
)
def test_max_iou_matches_oracle(seed, kwargs):
    rng = np.random.RandomState(seed)
    anchors = _random_boxes(rng, 200)
    gts = _random_boxes(rng, 5)
    expected = max_iou_oracle(anchors, gts, kwargs["pos_iou_thr"],
                              kwargs["neg_iou_thr"],
                              kwargs.get("min_pos_iou", 0.0),
                              kwargs.get("gt_max_assign_all", True),
                              kwargs.get("match_low_quality", True))
    gt_pad, valid = _pad_gts(gts, 8)
    got, _ = max_iou_assign(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(valid), **kwargs
    )
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_max_iou_reference_docstring_example():
    # max_iou_assigner.py:86-91
    bboxes = np.array([[0, 0, 10, 10], [10, 10, 20, 20]], np.float32)
    gts = np.array([[0, 0, 10, 9]], np.float32)
    gt_pad, valid = _pad_gts(gts, 4)
    got, _ = max_iou_assign(
        jnp.asarray(bboxes), jnp.asarray(gt_pad), jnp.asarray(valid),
        pos_iou_thr=0.5, neg_iou_thr=0.5,
    )
    np.testing.assert_array_equal(np.asarray(got), [1, 0])


def test_max_iou_no_gt_all_background():
    anchors = _random_boxes(np.random.RandomState(0), 20)
    gt_pad, valid = _pad_gts(np.zeros((0, 4), np.float32), 4)
    got, _ = max_iou_assign(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(valid),
        pos_iou_thr=0.5, neg_iou_thr=0.4,
    )
    assert (np.asarray(got) == 0).all()


def test_max_iou_low_quality_later_gt_overwrites():
    # two GTs whose best anchor is the SAME anchor: the reference loop
    # writes gt0 then gt1 — gt1 must win (:184-199)
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    gts = np.array([[0, 0, 10, 8], [0, 2, 10, 10]], np.float32)
    gt_pad, valid = _pad_gts(gts, 4)
    got, _ = max_iou_assign(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(valid),
        pos_iou_thr=0.9, neg_iou_thr=0.9, min_pos_iou=0.1,
    )
    assert int(got[0]) == 2
    expected = max_iou_oracle(anchors, gts, 0.9, 0.9, 0.1)
    np.testing.assert_array_equal(np.asarray(got), expected)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("topk", [3, 9])
def test_atss_matches_oracle(seed, topk):
    rng = np.random.RandomState(seed)
    gen = AnchorGenerator(
        strides=[8, 16, 32], ratios=[1.0], octave_base_scale=8,
        scales_per_octave=1,
    )
    anchors, _, counts = flat_anchors_for_input(gen, (96, 128))
    gts = _random_boxes(rng, 4, lo=0, hi=100, min_wh=16, max_wh=64)
    expected = atss_oracle(anchors, counts, gts, topk)
    gt_pad, valid = _pad_gts(gts, 8)
    got, _ = atss_assign(
        jnp.asarray(anchors), tuple(counts), jnp.asarray(gt_pad),
        jnp.asarray(valid), topk=topk,
    )
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_atss_multi_anchor_cells():
    # A=3 anchors/cell (retina-style) — candidate selection runs over the
    # flat per-level anchor lists exactly like the reference
    rng = np.random.RandomState(7)
    gen = AnchorGenerator(
        strides=[8, 16], ratios=[0.5, 1.0, 2.0], octave_base_scale=4,
        scales_per_octave=1,
    )
    anchors, _, counts = flat_anchors_for_input(gen, (64, 64))
    gts = _random_boxes(rng, 3, lo=0, hi=48, min_wh=12, max_wh=40)
    expected = atss_oracle(anchors, counts, gts, topk=9)
    gt_pad, valid = _pad_gts(gts, 4)
    got, _ = atss_assign(
        jnp.asarray(anchors), tuple(counts), jnp.asarray(gt_pad),
        jnp.asarray(valid), topk=9,
    )
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_atss_no_gt():
    gen = AnchorGenerator(strides=[8], ratios=[1.0], octave_base_scale=8,
                          scales_per_octave=1)
    anchors, _, counts = flat_anchors_for_input(gen, (32, 32))
    gt_pad, valid = _pad_gts(np.zeros((0, 4), np.float32), 4)
    got, _ = atss_assign(
        jnp.asarray(anchors), tuple(counts), jnp.asarray(gt_pad),
        jnp.asarray(valid), topk=9,
    )
    assert (np.asarray(got) == 0).all()
