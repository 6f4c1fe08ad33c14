"""Vote-NMS: on-device (JAX) implementation + NumPy oracle.

The reference implements box-voting NMS as a sequential C++ CPU extension
(/root/reference/radet/ops/vote/vote_ext.cpp:70-353) and pays a device->host
round trip per image at inference (radet_head.py:151-157).  Here the whole
thing runs on-device with static shapes: a ``lax.scan`` over at most
``max_out`` cluster-emission steps, each doing O(K) vectorized work
(argmax seed selection, one-vs-all IoU, weighted voting with 1-sigma outlier
rejection).  Because clusters are emitted in descending cluster-score order —
exactly the C++ suppression order — emitting only the first ``max_out``
clusters reproduces the reference's ``[:max_num]`` truncation.

Semantics preserved (vote_ext.cpp):
- greedy clustering by cluster_score descending, per-class (label mismatch
  never clusters), membership when IoU > threshold (strict);
- per-coordinate weighted vote using vote_scores, then re-vote over members
  within one weighted standard deviation of the first vote (vote_single_dim,
  :8-35);
- optional IoU-gaussian reweighting exp(-(1-iou)^2 / sigma) of member vote
  scores (:165-168);
- emitted score = max cluster score in the cluster (= the seed's, :195);
- ``global`` mode additionally suppresses every remaining box of an emitted
  label (:247-276).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# NumPy oracle (test reference / host fallback)
# ---------------------------------------------------------------------------


def _vote_single_dim_np(scores: np.ndarray, x: np.ndarray) -> float:
    ssum = scores.sum()
    mean = float((scores * x).sum() / ssum)
    sigma = float(np.sqrt((scores * (x - mean) ** 2).sum() / ssum))
    keep = (x >= mean - sigma) & (x <= mean + sigma)
    if not keep.any():
        return mean
    return float((scores[keep] * x[keep]).sum() / scores[keep].sum())


def vote_nms_numpy(
    boxes: np.ndarray,
    cluster_scores: np.ndarray,
    vote_scores: np.ndarray,
    labels: np.ndarray,
    iou_threshold: float = 0.65,
    iou_enable: bool = False,
    sigma: float = 0.025,
    global_mode: bool = False,
):
    """Sequential oracle with reference semantics. Returns (boxes, labels, scores)."""
    n = boxes.shape[0]
    order = np.argsort(-cluster_scores, kind="stable")
    suppressed = np.zeros(n, dtype=bool)
    out_boxes, out_labels, out_scores = [], [], []
    done_labels: set = set()
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for oi in range(n):
        i = order[oi]
        if suppressed[i]:
            continue
        li = labels[i]
        if global_mode and li in done_labels:
            suppressed[i] = True
            continue
        suppressed[i] = True
        members = [i]
        member_vote = [vote_scores[i]]
        member_cluster = [cluster_scores[i]]
        for oj in range(oi + 1, n):
            j = order[oj]
            if labels[j] != li or suppressed[j]:
                continue
            xl = max(boxes[i, 0], boxes[j, 0])
            yt = max(boxes[i, 1], boxes[j, 1])
            xr = min(boxes[i, 2], boxes[j, 2])
            yb = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xr - xl) * max(0.0, yb - yt)
            iou = inter / (areas[i] + areas[j] - inter)
            vs_j = vote_scores[j]
            if iou_enable:
                vs_j = vs_j * np.exp(-((1 - iou) ** 2) / sigma)
            if iou > iou_threshold:
                suppressed[j] = True
                members.append(j)
                member_vote.append(vs_j)
                member_cluster.append(cluster_scores[j])
        mv = np.asarray(member_vote, np.float64)
        voted = [
            _vote_single_dim_np(mv, boxes[np.asarray(members), c].astype(np.float64))
            for c in range(4)
        ]
        out_boxes.append(voted)
        out_labels.append(li)
        out_scores.append(max(member_cluster))
        if global_mode:
            done_labels.add(li)
    return (
        np.asarray(out_boxes, np.float32).reshape(-1, 4),
        np.asarray(out_labels, np.int64),
        np.asarray(out_scores, np.float32),
    )


# ---------------------------------------------------------------------------
# On-device implementation
# ---------------------------------------------------------------------------


def _iou_one_vs_all(box, boxes):
    xl = jnp.maximum(box[0], boxes[:, 0])
    yt = jnp.maximum(box[1], boxes[:, 1])
    xr = jnp.minimum(box[2], boxes[:, 2])
    yb = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.clip(xr - xl, 0) * jnp.clip(yb - yt, 0)
    area_i = jnp.clip(box[2] - box[0], 0) * jnp.clip(box[3] - box[1], 0)
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    return inter / jnp.maximum(area_i + areas - inter, 1e-12)


def _vote_coords(member_w, boxes):
    """Weighted vote + 1-sigma refilter for the 4 coordinates. member_w: (K,)."""
    wsum = jnp.maximum(member_w.sum(), 1e-12)
    mean = (member_w[:, None] * boxes).sum(0) / wsum  # (4,)
    var = (member_w[:, None] * (boxes - mean) ** 2).sum(0) / wsum
    sig = jnp.sqrt(var)
    inlier = (boxes >= mean - sig) & (boxes <= mean + sig)  # (K, 4)
    w2 = member_w[:, None] * inlier
    w2sum = jnp.maximum(w2.sum(0), 1e-12)
    voted = (w2 * boxes).sum(0) / w2sum
    # empty-inlier guard (cannot happen with the seed present, but stay safe)
    return jnp.where(w2.sum(0) > 0, voted, mean)


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "iou_enable", "sigma", "global_mode"),
)
def vote_nms_device(
    boxes,
    cluster_scores,
    vote_scores,
    labels,
    valid,
    *,
    iou_threshold: float = 0.65,
    max_out: int = 100,
    iou_enable: bool = False,
    sigma: float = 0.025,
    global_mode: bool = False,
):
    """Static-shape vote-NMS on device.

    Args:
        boxes: (K, 4) xyxy.
        cluster_scores / vote_scores: (K,).
        labels: (K,) int32.
        valid: (K,) bool — invalid slots never participate.
    Returns:
        (out_boxes (max_out, 4), out_labels (max_out,), out_scores (max_out,),
         out_valid (max_out,)) — clusters in descending cluster-score order.
    """
    labels = labels.astype(jnp.int32)
    suppressed0 = ~valid

    def step(suppressed, _):
        avail = jnp.where(suppressed, NEG_INF, cluster_scores)
        i = jnp.argmax(avail)
        do_emit = avail[i] > NEG_INF
        seed_box = boxes[i]
        seed_label = labels[i]
        iou = _iou_one_vs_all(seed_box, boxes)
        member = (~suppressed) & (labels == seed_label) & (iou > iou_threshold)
        member = member.at[i].set(True)
        member = member & do_emit
        vs = vote_scores
        if iou_enable:
            vs = vs * jnp.exp(-((1.0 - iou) ** 2) / sigma)
        w = jnp.where(member, vs, 0.0)
        voted = _vote_coords(w, boxes)
        score = jnp.max(jnp.where(member, cluster_scores, NEG_INF))
        new_suppressed = suppressed | member
        if global_mode:
            new_suppressed = new_suppressed | ((labels == seed_label) & do_emit)
        out = (
            jnp.where(do_emit, voted, 0.0),
            jnp.where(do_emit, seed_label, -1),
            jnp.where(do_emit, score, 0.0),
            do_emit,
        )
        return new_suppressed, out

    _, (ob, ol, osc, ov) = jax.lax.scan(step, suppressed0, None, length=max_out)
    return ob, ol, osc, ov


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def batched_nms_device(boxes, scores, labels, valid, *, iou_threshold: float = 0.6, max_out: int = 100):
    """Plain class-aware greedy NMS (the reference's ``batched_nms`` fallback
    path, radet_head.py:160-163) with static shapes, on device."""
    labels = labels.astype(jnp.int32)
    suppressed0 = ~valid

    def step(suppressed, _):
        avail = jnp.where(suppressed, NEG_INF, scores)
        i = jnp.argmax(avail)
        do_emit = avail[i] > NEG_INF
        iou = _iou_one_vs_all(boxes[i], boxes)
        member = (~suppressed) & (labels == labels[i]) & (iou > iou_threshold)
        member = member.at[i].set(True)
        member = member & do_emit
        out = (
            jnp.where(do_emit, boxes[i], 0.0),
            jnp.where(do_emit, labels[i], -1),
            jnp.where(do_emit, scores[i], 0.0),
            do_emit,
        )
        return suppressed | member, out

    _, (ob, ol, osc, ov) = jax.lax.scan(step, suppressed0, None, length=max_out)
    return ob, ol, osc, ov
