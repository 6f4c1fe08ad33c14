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
            iou = inter / max(areas[i] + areas[j] - inter, 1e-12)
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


# ---------------------------------------------------------------------------
# Fast exact formulation: parallel greedy via keep-mask fixed point
# ---------------------------------------------------------------------------
#
# Greedy NMS's keep set is the unique fixed point of
#     keep_i = valid_i and (no j with score_j > score_i, same label,
#                           IoU > thr, keep_j)
# (sort by score so "higher score" = "lower index").  Iterating this
# anti-monotone map from all-true converges in chain-depth steps (typically
# 2-4) — a short lax.while_loop of dense matrix ops instead of max_out
# sequential argmax steps.  Cluster membership is then exact greedy too:
# a suppressed box belongs to the LOWEST-INDEX kept seed that overlaps it
# (same label, IoU > thr) — greedy's first-emitted capturer.  Voting becomes
# two masked matrix products.  ``global`` mode keeps only the first kept seed
# per label (see vote_ext.cpp:247-276; suppressed-label seeds never capture
# members, and first-cluster membership is unaffected).


@functools.partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "max_out", "iou_enable", "sigma", "global_mode", "presorted"
    ),
)
def vote_nms_device_fast(
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
    presorted: bool = False,
):
    """Exact vote-NMS via the parallel-greedy fixed point. Same contract as
    :func:`vote_nms_device`; O(K^2) memory — pre-reduce candidates with a
    global top-k (see postprocess.get_bboxes nms_topk).

    ``presorted=True`` asserts the caller already ordered candidates by
    cluster score descending with invalid entries last (what the
    postprocess nms_topk reduction emits) — the internal argsort and its
    five latency-bound per-row gathers are skipped."""
    k = boxes.shape[0]
    labels = labels.astype(jnp.int32)
    if not presorted:
        neg = jnp.where(valid, cluster_scores, NEG_INF)
        order = jnp.argsort(-neg)  # descending score, invalid last
        boxes = boxes[order]
        cluster_scores = cluster_scores[order]
        vote_scores = vote_scores[order]
        labels = labels[order]
        valid = valid[order]

    # pairwise IoU
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    iou = inter / jnp.maximum(areas[:, None] + areas[None, :] - inter, 1e-12)

    idx = jnp.arange(k)
    same_label = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    overlap = same_label & (iou > iou_threshold)
    blockers = overlap & (idx[None, :] < idx[:, None])  # j higher-scored than i

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        new_keep = valid & ~jnp.any(blockers & keep[None, :], axis=1)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.array(True)))

    if global_mode:
        # only the first kept seed of each label emits
        earlier_same = same_label & (idx[None, :] < idx[:, None]) & keep[None, :]
        keep = keep & ~jnp.any(earlier_same, axis=1)

    # membership: lowest-index kept seed overlapping each box (incl. itself)
    cand = overlap & keep[:, None]  # seed i captures box m (i < m enforced next)
    cand = cand & (idx[:, None] <= idx[None, :])
    cand = cand.at[idx, idx].set(keep)  # every kept seed owns itself
    seed_of = jnp.argmax(cand, axis=0)  # first True along seeds (lowest index)
    has_seed = jnp.any(cand, axis=0)
    member = (
        (seed_of[None, :] == idx[:, None]) & has_seed[None, :] & keep[:, None]
    )  # (seed, box)

    vs = vote_scores
    if iou_enable:
        vs = vs[None, :] * jnp.exp(-((1.0 - iou) ** 2) / sigma)  # (seed, box)
        w = jnp.where(member, vs, 0.0)
    else:
        w = jnp.where(member, vs[None, :], 0.0)
    # Precision.HIGHEST on the voting matmuls: the TPU MXU multiplies in
    # bf16 by default, which quantizes means/variances enough to flip
    # 1-sigma inlier membership and shift voted coordinates by pixels
    # (measured: 70% of coords off vs the f64 oracle at default precision,
    # 1.6% boundary flips at HIGHEST). These K x 4 products are trivial.
    _dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    wsum = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    mean = _dot(w, boxes) / wsum  # (K, 4)
    var = _dot(w, boxes ** 2) / wsum - mean ** 2
    sig = jnp.sqrt(jnp.clip(var, 0))
    lo_b = mean - sig
    hi_b = mean + sig
    voted = []
    for c in range(4):
        x = boxes[:, c]
        inlier = (x[None, :] >= lo_b[:, c, None]) & (x[None, :] <= hi_b[:, c, None])
        w2 = w * inlier
        denom = w2.sum(axis=1)
        voted_c = _dot(w2, x) / jnp.maximum(denom, 1e-12)
        voted.append(jnp.where(denom > 0, voted_c, mean[:, c]))
    voted = jnp.stack(voted, axis=-1)  # (K, 4)

    # emit kept seeds in index (= score) order into max_out fixed slots
    rank = jnp.cumsum(keep) - 1  # rank among kept
    slot = jnp.where(keep & (rank < max_out), rank, max_out)  # overflow -> dropped
    out_boxes = jnp.zeros((max_out + 1, 4)).at[slot].set(jnp.where(keep[:, None], voted, 0.0))[:max_out]
    out_scores = jnp.zeros((max_out + 1,)).at[slot].set(jnp.where(keep, cluster_scores, 0.0))[:max_out]
    out_labels = jnp.full((max_out + 1,), -1, jnp.int32).at[slot].set(jnp.where(keep, labels, -1))[:max_out]
    out_valid = jnp.zeros((max_out + 1,), bool).at[slot].set(keep)[:max_out]
    return out_boxes, out_labels, out_scores, out_valid


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


@functools.partial(
    jax.jit, static_argnames=("score_thr", "iou_threshold", "top_k", "max_out")
)
def fast_nms_device(
    boxes,
    scores,
    *,
    score_thr: float = 0.05,
    iou_threshold: float = 0.5,
    top_k: int = 200,
    max_out: int = 100,
):
    """YOLACT Fast NMS (reference ``core/post_processing/bbox_nms.py:82-150``)
    as one batched matrix program — the one reference NMS that is *already*
    shaped for an accelerator (per-class upper-triangular IoU max), so the
    TPU form is a direct dense formulation with static shapes.

    Args:
        boxes: (N, 4) xyxy (class-agnostic, the RADet/YOLACT box layout).
        scores: (N, C) per-class scores (no background column).
    Returns (boxes (M, 4), labels (M,), scores (M,), valid (M,)) with
    ``M = max_out``, ranked by score — same relaxed-suppression semantics
    (already-suppressed detections still suppress others).
    """
    n, c = scores.shape
    k = min(top_k, n)
    # per-class top-k by score (reference sort+slice, :116-120)
    cls_scores, idx = jax.lax.top_k(scores.T, k)  # (C, k)
    cls_boxes = boxes[idx.reshape(-1)].reshape(c, k, 4)
    # upper-triangular pairwise IoU, columnwise max over earlier dets (:124-127)
    lt = jnp.maximum(cls_boxes[:, :, None, :2], cls_boxes[:, None, :, :2])
    rb = jnp.minimum(cls_boxes[:, :, None, 2:], cls_boxes[:, None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.clip(cls_boxes[..., 2] - cls_boxes[..., 0], 0) * jnp.clip(
        cls_boxes[..., 3] - cls_boxes[..., 1], 0
    )
    iou = inter / jnp.maximum(area[:, :, None] + area[:, None, :] - inter, 1e-12)
    triu = jnp.triu(jnp.ones((k, k), bool), 1)
    iou_max = jnp.where(triu[None], iou, 0.0).max(axis=1)  # (C, k)
    keep = (iou_max <= iou_threshold) & (cls_scores > score_thr)  # (:129-133)
    # flatten classes, rank by score, emit max_out fixed slots (:137-146)
    flat_scores = jnp.where(keep, cls_scores, NEG_INF).reshape(-1)
    flat_labels = jnp.broadcast_to(jnp.arange(c)[:, None], (c, k)).reshape(-1)
    out_scores, order = jax.lax.top_k(flat_scores, max_out)
    out_valid = out_scores > NEG_INF
    out_boxes = cls_boxes.reshape(-1, 4)[order]
    out_labels = flat_labels[order].astype(jnp.int32)
    return (
        jnp.where(out_valid[:, None], out_boxes, 0.0),
        jnp.where(out_valid, out_labels, -1),
        jnp.where(out_valid, out_scores, 0.0),
        out_valid,
    )
