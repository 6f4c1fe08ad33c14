"""IoU-based anchor assigners (MaxIoU, ATSS) — vectorized, on device.

The reference implements these as per-image torch loops invoked from CPU-side
target computation (/root/reference/radet/core/bbox/assigners/
max_iou_assigner.py:127-212, atss_assigner.py:33-178, each built by
AnchorHead/ATSSHead).  The TPU-native form is a pure jnp function over a
static (N,) anchor set and a padded (G,) GT set that runs INSIDE the jitted
train step (vmapped over the batch) — no dynamic shapes, no host round trip.

Output convention (matches the reference AssignResult.gt_inds):
    -1  untouched / ignore (MaxIoU anchors that are neither pos nor neg)
     0  negative (background)
    g+1 positive, 1-based GT index

PseudoSampler (reference samplers/pseudo_sampler.py) is the identity on this
encoding — pos = gt_inds > 0, neg = gt_inds == 0 — so it needs no code here;
the sampler zoo beyond it is only reachable through two-stage heads the
reference does not ship (docs/PARITY.md).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .box_ops import bbox_iou_pairwise

INF = 1e8


def max_iou_assign(
    bboxes,  # (N, 4) xyxy anchors
    gt_boxes,  # (G, 4) xyxy, padded
    gt_valid,  # (G,) bool
    *,
    pos_iou_thr: float,
    neg_iou_thr,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
    match_low_quality: bool = True,
):
    """Vectorized MaxIoUAssigner.assign_wrt_overlaps
    (reference max_iou_assigner.py:127-212).

    Steps (order matters — later steps overwrite earlier ones):
      1. default -1 (ignore);
      2. negatives: max_overlap in the neg window -> 0;
      3. positives: max_overlap >= pos_iou_thr -> argmax GT (1-based);
      4. low-quality matches: each GT claims its best anchor(s) when its best
         IoU >= min_pos_iou; LATER GTs OVERWRITE earlier ones (:193-199) —
         expressed here as a max over (g+1) * claim_mask, which picks the
         highest claiming GT index, exactly the loop's last-writer-wins.

    Returns (assigned (N,) int32, max_overlaps (N,) f32).
    """
    overlaps = bbox_iou_pairwise(gt_boxes, bboxes)  # (G, N)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    return assign_wrt_overlaps(
        overlaps,
        gt_valid,
        pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou,
        gt_max_assign_all=gt_max_assign_all,
        match_low_quality=match_low_quality,
    )


def assign_wrt_overlaps(
    overlaps,  # (G, N) IoU, rows of invalid GTs already masked to -1
    gt_valid,  # (G,) bool
    *,
    pos_iou_thr: float,
    neg_iou_thr,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
    match_low_quality: bool = True,
):
    """The overlap->assignment core of MaxIoUAssigner, split out so
    ApproxMaxIoUAssigner (overlaps pre-maxed over the approx set,
    reference approx_max_iou_assigner.py:63-145) reuses it verbatim."""
    g, n = overlaps.shape
    max_overlaps = overlaps.max(axis=0)  # (N,)
    argmax_overlaps = jnp.argmax(overlaps, axis=0)  # first max, like torch

    assigned = jnp.full((n,), -1, jnp.int32)
    # step 2: negatives
    if isinstance(neg_iou_thr, (tuple, list)):
        lo, hi = neg_iou_thr
        neg = (max_overlaps >= lo) & (max_overlaps < hi)
    else:
        neg = (max_overlaps >= 0) & (max_overlaps < float(neg_iou_thr))
    assigned = jnp.where(neg, 0, assigned)
    # step 3: positives
    pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_max = overlaps.max(axis=1)  # (G,)
        eligible = (gt_max >= min_pos_iou) & gt_valid
        if gt_max_assign_all:
            claim = (overlaps == gt_max[:, None]) & eligible[:, None]  # (G, N)
        else:
            first_max = jnp.argmax(overlaps, axis=1)  # (G,)
            claim = (
                jnp.arange(n)[None, :] == first_max[:, None]
            ) & eligible[:, None]
        claim_idx = jnp.where(
            claim, jnp.arange(1, g + 1, dtype=jnp.int32)[:, None], 0
        ).max(axis=0)
        assigned = jnp.where(claim_idx > 0, claim_idx, assigned)

    # no valid GT at all: everything is background (reference :145-150)
    assigned = jnp.where(gt_valid.any(), assigned, 0)
    return assigned, jnp.maximum(max_overlaps, 0.0)


def atss_assign(
    bboxes,  # (N, 4) xyxy anchors (all levels concatenated)
    num_level_bboxes: Sequence[int],  # static per-level anchor counts
    gt_boxes,  # (G, 4) padded
    gt_valid,  # (G,) bool
    *,
    topk: int,
    inside_mask=None,  # optional (N,) bool: anchors eligible as candidates
):
    """Vectorized ATSSAssigner.assign (reference atss_assigner.py:33-178).

    1. IoU between every anchor and GT; center distances.
    2. Per level, the ``min(topk, n_level)`` anchors closest to each GT
       center become candidates — a static candidate count C per GT.
    3. Per GT, threshold = mean + std (Bessel, torch.std default) of its
       candidates' IoUs; candidates >= threshold AND center strictly inside
       the GT (margin 0.01) are positive-eligible.
    4. Each anchor takes the eligible GT of highest IoU (1-based); else 0.

    ``inside_mask`` folds the reference's anchor_inside_flags prefilter
    (anchor_head.py:211-217) into the same static-shape pass: excluded
    anchors are pushed to +INF distance so they never become candidates.
    Deviation from the reference when the mask excludes anchors: the
    reference recomputes per-level candidate counts over the filtered set
    (atss_head.py:599-600,655-660) while this keeps min(topk, n_level) —
    identical whenever nothing is filtered (allowed_border=-1, every shipped
    config).

    Returns (assigned (N,) int32: 0 neg / g+1 pos, max_overlaps (N,) f32).
    """
    n = bboxes.shape[0]
    g = gt_boxes.shape[0]
    assert sum(num_level_bboxes) == n, (num_level_bboxes, n)

    overlaps = bbox_iou_pairwise(bboxes, gt_boxes)  # (N, G)
    overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)

    gt_cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gt_cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    acx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
    acy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
    distances = jnp.sqrt(
        (acx[:, None] - gt_cx[None, :]) ** 2 + (acy[:, None] - gt_cy[None, :]) ** 2
    )  # (N, G)
    if inside_mask is not None:
        distances = jnp.where(inside_mask[:, None], distances, INF)

    # per-level top-k closest anchors per GT (static k per level)
    cand_idx_parts = []
    start = 0
    for n_l in num_level_bboxes:
        k_l = min(topk, n_l)
        d_l = distances[start : start + n_l]  # (n_l, G)
        # top-k smallest distance == top-k of negated, per GT column
        _, idx = jax.lax.top_k(-d_l.T, k_l)  # (G, k_l)
        cand_idx_parts.append(idx.T + start)  # (k_l, G)
        start += n_l
    cand_idx = jnp.concatenate(cand_idx_parts, axis=0)  # (C, G) static C

    cand_overlaps = jnp.take_along_axis(overlaps, cand_idx, axis=0)  # (C, G)
    mean_per_gt = cand_overlaps.mean(axis=0)
    std_per_gt = cand_overlaps.std(axis=0, ddof=1)  # torch.std default: Bessel
    thr_per_gt = mean_per_gt + std_per_gt
    is_pos = cand_overlaps >= thr_per_gt[None, :]  # (C, G)

    # candidate centers strictly inside the GT box (margin 0.01, :147-154)
    ccx = jnp.take_along_axis(
        jnp.broadcast_to(acx[:, None], (n, g)), cand_idx, axis=0
    )
    ccy = jnp.take_along_axis(
        jnp.broadcast_to(acy[:, None], (n, g)), cand_idx, axis=0
    )
    l_ = ccx - gt_boxes[None, :, 0]
    t_ = ccy - gt_boxes[None, :, 1]
    r_ = gt_boxes[None, :, 2] - ccx
    b_ = gt_boxes[None, :, 3] - ccy
    in_gt = jnp.minimum(jnp.minimum(l_, r_), jnp.minimum(t_, b_)) > 0.01
    is_pos = is_pos & in_gt & gt_valid[None, :]
    if inside_mask is not None:
        is_pos = is_pos & jnp.take_along_axis(
            jnp.broadcast_to(inside_mask[:, None], (n, g)), cand_idx, axis=0
        )

    # scatter candidate eligibility back to the dense (N, G) grid
    eligible = (
        jnp.zeros((n, g), bool)
        .at[cand_idx, jnp.arange(g)[None, :]]
        .max(is_pos)
    )
    overlaps_inf = jnp.where(eligible, overlaps, -INF)
    best = overlaps_inf.max(axis=1)
    best_gt = jnp.argmax(overlaps_inf, axis=1).astype(jnp.int32)
    assigned = jnp.where(best > -INF * 0.5, best_gt + 1, 0)
    return assigned, jnp.where(best > -INF * 0.5, best, 0.0)


def assigned_to_dense_targets(
    assigned,  # (N,) int32: -1 ignore, 0 neg, g+1 pos
    gt_boxes,  # (G, 4)
    gt_labels,  # (G,) int32
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense per-anchor (labels, target_boxes, pos_mask) from an assignment.

    GT attributes are selected with a one-hot MXU contraction instead of
    take_along_axis (TPU gathers are latency-bound; see radet_loss.py).
    """
    g = gt_boxes.shape[0]
    pos = assigned > 0
    idx0 = jnp.clip(assigned - 1, 0)
    onehot = (idx0[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)
    target_boxes = jnp.einsum(
        "ng,gk->nk", onehot, gt_boxes, precision=jax.lax.Precision.HIGHEST
    )
    tlabels = jnp.einsum(
        "ng,g->n",
        onehot,
        gt_labels.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    labels = jnp.where(pos, tlabels, num_classes)
    return labels, target_boxes, pos
