"""Visibility-guided probabilistic label assignment — on device, inside jit.

The reference computes this per-image in CPU dataloader workers
(/root/reference/radet/datasets/pipelines/label_assignment.py:136-201) and
ships dense per-anchor index/weight tensors through collate.  The TPU-native
design inverts that: the host pipeline only supplies, per GT, the distance-map
value sampled at each anchor center (``dist_vals`` — an (N_anchor, MAX_GT)
matrix; for BOP training with GT masks the distance map *is* the binary
visible mask, loading.py:579-581), and the full assignment — candidate
generation, min-area ambiguity resolution, probabilistic positive sampling —
runs vectorized in the jitted train step.

Semantics preserved (with file:line refs into label_assignment.py):

- candidacy: anchor center strictly inside the GT box (min TBLR side > 0.01)
  and max TBLR side within the level's regress range (:57-76);
- GTs processed smallest-area first; in ``min_area`` mode a later (larger) GT
  only sees anchors not yet claimed (claimed = positive or ignore) (:169-179);
- per GT: candidates with prob <= neg_threshold * max-prob stay negative
  (:98-100); among the rest, ``positive_num`` cells are sampled WITHOUT
  replacement proportional to prob when the pool is large enough, else (with
  ``balance_sample``) WITH replacement — the multiplicity becoming the loss
  weight (:109-126); unsampled pool members become weight-0 ignores (:130,194-196);
- output encoding here: ``gt_idx`` (N,) int32 with >=0 positive (0-based GT
  index), -1 negative, -2 ignore; ``weight`` (N,) float32 (1 for negatives,
  0 for ignores, sample-count for positives).  The reference's 1-based
  points_to_gt_index maps to this trivially.

Randomness is jax PRNG — distribution-parity with the reference's numpy RNG,
not stream-parity (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8
NEG_INF = -1e30


class AssignResult(NamedTuple):
    gt_idx: jnp.ndarray  # (N,) int32: >=0 pos, -1 neg, -2 ignore
    weight: jnp.ndarray  # (N,) float32


def candidate_mask(anchors, regress_ranges, gt_boxes, gt_valid):
    """(N, G) candidacy mask (label_assignment.py:57-76)."""
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    left = cx[:, None] - gt_boxes[None, :, 0]
    right = gt_boxes[None, :, 2] - cx[:, None]
    top = cy[:, None] - gt_boxes[None, :, 1]
    bottom = gt_boxes[None, :, 3] - cy[:, None]
    tblr = jnp.stack([left, top, right, bottom], axis=-1)  # (N, G, 4)
    min_side = tblr.min(axis=-1)
    max_side = tblr.max(axis=-1)
    in_box = min_side > 0.01
    in_range = (max_side >= regress_ranges[:, None, 0]) & (
        max_side <= regress_ranges[:, None, 1]
    )
    return in_box & in_range & gt_valid[None, :]


def _adaptive_k(anchor_sizes, candidates, object_size, positive_num):
    """Size-adaptive positive count (label_assignment.py:88-95): per anchor
    level present among the CANDIDATES, k ~= positive_num * sum(ratio_lvl *
    exp((obj_size - anchor_size_lvl) / (2 * anchor_size_lvl))).

    The reference averages over the full (unclaimed) candidate set —
    ``concat_anchor_box_sizes[candidate_points_index]`` at :190-191 — NOT
    the non-negative pool; the per-size grouping there equals this masked
    mean exactly."""
    cand_f = candidates.astype(jnp.float32)
    n_cand = jnp.maximum(cand_f.sum(), 1.0)
    dk = jnp.exp((object_size - anchor_sizes) / (2.0 * anchor_sizes))
    dk = (cand_f * dk).sum() / n_cand
    return jnp.asarray(positive_num * dk + 0.5, jnp.int32)


def _sample_one_gt(
    key,
    probs,
    pool,
    k,
    cap,
    balance_sample=True,
    by_distance=True,
):
    """Sample positives for one GT from its non-negative pool.

    probs: (N,) sampling probability (already masked: 0 outside pool).
    pool: (N,) bool non-negative candidate pool.
    k: number of positives to draw (may be traced, 1 <= k <= cap).
    cap: static upper bound on k.
    Returns counts (N,) float32 — sample multiplicity (with-replacement
    branch) or 0/1 (without-replacement branch).
    """
    n_pool = pool.sum()
    if by_distance:
        logits = jnp.where(pool, jnp.log(jnp.maximum(probs, EPS)), NEG_INF)
    else:
        # uniform over the pool (random_sample_by_distance=False,
        # label_assignment.py:113-114,120-121)
        logits = jnp.where(pool, 0.0, NEG_INF)

    k_with, k_without = jax.random.split(key)
    # WITH replacement: k categorical draws; multiplicity = weight
    draws = jax.random.categorical(k_with, logits, shape=(cap,))
    draw_live = (jnp.arange(cap) < k).astype(jnp.float32)
    counts_with = (
        jax.nn.one_hot(draws, logits.shape[0], dtype=jnp.float32)
        * draw_live[:, None]
    ).sum(0)
    # WITHOUT replacement ∝ probs: Gumbel top-k
    gumbel = jax.random.gumbel(k_without, logits.shape)
    scores = jnp.where(pool, logits + gumbel, NEG_INF)
    sorted_scores = jax.lax.top_k(scores, cap)[0]
    kth = jax.lax.dynamic_slice(sorted_scores, (jnp.clip(k - 1, 0),), (1,))[0]
    counts_without = (scores >= kth).astype(jnp.float32)
    # guard: if pool smaller than k the top-k picks everything valid
    counts_without = counts_without * pool.astype(jnp.float32)

    pool_small = n_pool < k
    if not balance_sample:
        # without balance_sample a too-small pool is taken wholesale, weight 1
        # (label_assignment.py:115-116)
        counts_with = pool.astype(jnp.float32)
    return jnp.where(pool_small, counts_with, counts_without)


@functools.partial(
    jax.jit,
    static_argnames=(
        "positive_num",
        "neg_threshold",
        "balance_sample",
        "adapt_positive_num",
        "random_sample_by_distance",
        "multiply_samplepro_for_weight",
        "ambiguous_sample",
    ),
)
def assign_labels(
    key,
    anchors,
    regress_ranges,
    gt_boxes,
    gt_valid,
    dist_vals,
    *,
    positive_num: int = 10,
    neg_threshold: float = 0.2,
    balance_sample: bool = True,
    adapt_positive_num: bool = False,
    random_sample_by_distance: bool = True,
    multiply_samplepro_for_weight: bool = False,
    ambiguous_sample: str = "min_area",
):
    """Single-image assignment. vmap over the batch for training.

    Args:
        key: PRNG key.
        anchors: (N, 4) xyxy (constant).
        regress_ranges: (N, 2) (constant).
        gt_boxes: (G, 4) xyxy, padded.
        gt_valid: (G,) bool.
        dist_vals: (N, G) distance-map value at each anchor center (any
            float dtype; upcast to f32 internally).
    Returns AssignResult(gt_idx (N,), weight (N,)).
    """
    n = anchors.shape[0]
    g = gt_boxes.shape[0]
    dist_vals = dist_vals.astype(jnp.float32)

    cand = candidate_mask(anchors, regress_ranges, gt_boxes, gt_valid)  # (N, G)
    if ambiguous_sample == "max_dis":
        # restrict each anchor to its maximum-distance GT (:158-161)
        masked_dist = jnp.where(
            cand, dist_vals, -jnp.inf
        )
        best_gt = jnp.argmax(masked_dist, axis=1)  # (N,)
        cand = cand & (best_gt[:, None] == jnp.arange(g)[None, :])
    areas = jnp.where(
        gt_valid,
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
        jnp.inf,
    )
    order = jnp.argsort(areas)  # smallest-area first (:169-170)

    gt_keys = jax.random.split(key, g)
    anchor_sizes = anchors[:, 2] - anchors[:, 0]
    k_cap = positive_num * 4 if adapt_positive_num else positive_num

    def body(carry, gi):
        gt_idx, weight, claimed = carry
        is_valid = gt_valid[gi]
        # min_area ambiguity: only unclaimed anchors are visible (:177-179)
        use_min_area = ambiguous_sample == "min_area"
        cand_g = cand[:, gi] & is_valid
        if use_min_area:
            cand_g = cand_g & (~claimed)
        p_raw = jnp.clip(dist_vals[:, gi], EPS)  # (:187)
        p = jnp.where(cand_g, p_raw, 0.0)
        pmax = p.max()
        pool = cand_g & (p > neg_threshold * pmax)  # (:98)
        has_pool = pool.any()

        if adapt_positive_num:
            obj_size = jnp.maximum(
                gt_boxes[gi, 2] - gt_boxes[gi, 0], gt_boxes[gi, 3] - gt_boxes[gi, 1]
            )
            # k_cap bounds the static draw count; the reference is unbounded,
            # but with the RADet regress ranges dk <= ~1.1 (each level's range
            # upper bound equals its anchor size), so the 4x cap never binds
            # on in-range data
            k = jnp.clip(_adaptive_k(anchor_sizes, cand_g, obj_size, positive_num), 1, k_cap)
        else:
            k = jnp.asarray(positive_num, jnp.int32)
        counts = _sample_one_gt(
            gt_keys[gi], p, pool, k, k_cap, balance_sample, random_sample_by_distance
        )
        if multiply_samplepro_for_weight:
            # multiplicity is additionally scaled by the raw distance value
            # (:127-128)
            counts = counts * p
        counts = jnp.where(has_pool, counts, 0.0)

        pos = counts > 0
        untouched = pool & (~pos)
        new_gt_idx = jnp.where(pos, gi, jnp.where(untouched, -2, gt_idx))
        new_weight = jnp.where(pos, counts, jnp.where(untouched, 0.0, weight))
        new_claimed = claimed | pos | untouched
        return (new_gt_idx, new_weight, new_claimed), None

    init = (
        jnp.full((n,), -1, jnp.int32),
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), bool),
    )
    (gt_idx, weight, _), _ = jax.lax.scan(body, init, order)
    return AssignResult(gt_idx=gt_idx.astype(jnp.int32), weight=weight)
