"""Batched, static-shape inference post-processing (decode + vote-NMS).

Replaces the reference's per-image python loop with host round-trips
(/root/reference/radet/models/dense_heads/radet_head.py:55-169, vote-NMS runs
on CPU at :150-158) with a fully on-device pipeline:

per level: sigmoid -> score-threshold mask -> fixed-size top-k over the
(cell, class) axis -> gather anchors/regs -> TBLR decode with per-image
border clamp; levels concatenated; optional rescale to original image space;
then on-device vote-NMS (ops/vote_nms.py) vmapped over the batch.  Output is
a fixed (B, max_per_img) detection set + validity mask — ONE device->host
transfer per batch.

Score semantics (vote_wrapper.py:7-43 and radet_head.py:160-166): with list-
typed ``cluster_score``/``vote_score`` config both resolve to cls*iou; the
plain-NMS fallback ranks by cls*iou.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box_coder import tblr_decode
from ..ops.vote_nms import batched_nms_device, vote_nms_device, vote_nms_device_fast

NEG_INF = -1e30


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, M, 4) xyxy
    scores: jnp.ndarray  # (B, M)
    labels: jnp.ndarray  # (B, M) int32
    valid: jnp.ndarray  # (B, M) bool
    # populated only on the with_nms=False proposal path: the anchor that
    # produced each candidate (reference radet_head.py:165-169 returns
    # anchors alongside proposals for the downstream pose stage)
    anchors: jnp.ndarray | None = None


def _decode_clip(g_anchors, g_regs, img_shapes, normalizer):
    """TBLR-decode candidates and clamp to the per-image resized bounds."""
    hw = img_shapes.astype(jnp.float32)  # (B, 2)
    boxes = tblr_decode(g_anchors, g_regs, normalizer=normalizer)
    x = jnp.clip(boxes[..., 0::2], 0, hw[:, None, None, 1])
    y = jnp.clip(boxes[..., 1::2], 0, hw[:, None, None, 0])
    return jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)


def _select_rows(idx, values_list, n):
    """Row selection by index via a fused one-hot MXU contraction.

    ``idx`` (B, K) selects rows from each (B, N, d) [or (B, N)] array in
    ``values_list``.  TPU ``take_along_axis`` lowers to a latency-bound
    scalar-fetch gather fusion (measured 3.6 ms of the 16 ms batch-128
    postprocess); a one-hot (B, K, N) einsum does the same selection on the
    MXU with the one-hot generated tile-local by the fusion — no HBM
    materialization.  Precision.HIGHEST keeps 0/1-weighted selection exact
    (default MXU precision rounds operands to bf16).
    """
    b, k = idx.shape
    packed = jnp.concatenate(
        [v[..., None] if v.ndim == 2 else v for v in values_list], axis=-1
    )  # (B, N, D)
    onehot = (idx[..., None] == jnp.arange(n)[None, None, :]).astype(jnp.float32)
    sel = jnp.einsum(
        "bkn,bnd->bkd", onehot, packed, precision=jax.lax.Precision.HIGHEST
    )
    outs, off = [], 0
    for v in values_list:
        d = 1 if v.ndim == 2 else v.shape[-1]
        outs.append(sel[..., off] if v.ndim == 2 else sel[..., off : off + d])
        off += d
    return outs


def _resolve_score(kind, cls_scores, iou_scores):
    if isinstance(kind, (list, tuple)):
        return cls_scores * iou_scores
    if kind == "cls":
        return cls_scores
    if kind == "iou":
        return iou_scores
    raise ValueError(f"unexpected score type {kind!r}")


def select_candidates(
    cls_list: Sequence[jnp.ndarray],
    reg_list: Sequence[jnp.ndarray],
    iou_list: Sequence[jnp.ndarray],
    anchors_per_level: Sequence[np.ndarray],
    img_shapes,  # (B, 2) float (h, w) of the resized (pre-pad) image
    *,
    score_thr: float,
    nms_pre: int,
    normalizer: float = 1.0 / 8.0,
):
    """Per-level threshold + top-k + decode; returns concatenated candidates.

    Returns (boxes (B,K,4), cls_scores (B,K), iou_scores (B,K),
    labels (B,K) int32, valid (B,K)).
    """
    all_boxes, all_cls, all_iou, all_labels, all_valid, all_anchors = [], [], [], [], [], []
    for cls_map, reg_map, iou_map, anchors in zip(
        cls_list, reg_list, iou_list, anchors_per_level
    ):
        b = cls_map.shape[0]
        c = cls_map.shape[-1]
        n_l = anchors.shape[0]
        scores = jax.nn.sigmoid(cls_map.reshape(b, n_l, c))
        ious = jax.nn.sigmoid(iou_map.reshape(b, n_l))
        regs = reg_map.reshape(b, n_l, 4)

        k = min(nms_pre, n_l * c)
        masked = jnp.where(scores > score_thr, scores, NEG_INF)  # (B, n_l, C)
        top_scores, pair_idx = jax.lax.top_k(masked.reshape(b, n_l * c), k)
        anchor_idx = pair_idx // c
        valid = top_scores > NEG_INF
        label = (pair_idx % c).astype(jnp.int32)

        anchors_j = jnp.broadcast_to(jnp.asarray(anchors)[None], (b, n_l, 4))
        g_anchors, g_regs, g_ious = _select_rows(
            anchor_idx, [anchors_j, regs, ious], n_l
        )
        boxes = _decode_clip(g_anchors, g_regs, img_shapes, normalizer)

        all_boxes.append(boxes)
        all_cls.append(jnp.where(valid, top_scores, 0.0))
        all_iou.append(g_ious)
        all_labels.append(label)
        all_valid.append(valid)
        all_anchors.append(g_anchors)

    return (
        jnp.concatenate(all_boxes, axis=1),
        jnp.concatenate(all_cls, axis=1),
        jnp.concatenate(all_iou, axis=1),
        jnp.concatenate(all_labels, axis=1),
        jnp.concatenate(all_valid, axis=1),
        jnp.concatenate(all_anchors, axis=1),
    )


def select_candidates_global(
    cls_list,
    reg_list,
    iou_list,
    anchors_per_level,
    img_shapes,
    *,
    score_thr: float,
    topk: int,
    normalizer: float = 1.0 / 8.0,
    use_approx_topk: bool = True,
    approx_recall: float = 0.95,
):
    """Single global top-k over all levels' (cell, class) pairs.

    The TPU-first reformulation of the per-level candidate selection: concat
    level score maps into one (B, N_total*C) array, one (approximate) top-k
    straight down to the NMS input size, then decode only those ``topk``
    candidates.  Deviates from the reference's per-level nms_pre=1000 caps
    only when more than ``topk`` pairs clear the score threshold (the caps
    then bind differently) — with score_thr 0.05 that is a pathological
    scene; use candidate_mode='per_level' for strict reference semantics.
    """
    b = cls_list[0].shape[0]
    c = cls_list[0].shape[-1]
    scores = jnp.concatenate(
        [jax.nn.sigmoid(m.reshape(b, -1, c)) for m in cls_list], axis=1
    )  # (B, N, C)
    ious = jnp.concatenate(
        [jax.nn.sigmoid(m.reshape(b, -1)) for m in iou_list], axis=1
    )  # (B, N)
    regs = jnp.concatenate([m.reshape(b, -1, 4) for m in reg_list], axis=1)
    anchors = jnp.asarray(np.concatenate(anchors_per_level, 0))  # (N, 4)
    n = anchors.shape[0]

    masked = jnp.where(scores > score_thr, scores, NEG_INF).reshape(b, n * c)
    k = min(topk, n * c)
    if use_approx_topk:
        top_scores, pair_idx = jax.lax.approx_max_k(
            masked, k, recall_target=approx_recall
        )
    else:
        top_scores, pair_idx = jax.lax.top_k(masked, k)
    anchor_idx = pair_idx // c
    label = (pair_idx % c).astype(jnp.int32)
    valid = top_scores > NEG_INF

    g_anchors, g_regs, g_ious = _select_rows(
        anchor_idx,
        [jnp.broadcast_to(anchors[None], (b, n, 4)), regs, ious],
        n,
    )
    boxes = _decode_clip(g_anchors, g_regs, img_shapes, normalizer)
    return boxes, jnp.where(valid, top_scores, 0.0), g_ious, label, valid, g_anchors


def get_bboxes_anchor(
    cls_list,
    reg_list,
    factor_list,  # per-level (B, H, W, A) centerness maps, or None
    anchors_per_level,  # list of (N_l, 4) — N_l includes the A multiplicity
    img_shapes,  # (B, 2) resized (h, w)
    scale_factors,  # (B, 4)
    decode_fn,  # (anchors, deltas, max_shape=...) -> boxes (core.box_coder)
    *,
    test_cfg: dict,
    rescale: bool = True,
    with_nms: bool = True,
) -> Detections:
    """Batched static-shape inference for the generic anchor heads.

    Replaces the reference's per-image loop (ATSSHead._get_bboxes_single,
    atss_head.py:389-479 + multiclass_nms, core/post_processing/
    bbox_nms.py:8-80): per level, nms_pre ANCHOR rows are kept by max
    (score x factor); rows are delta-decoded with per-image border clamp;
    all (box, class) pairs above score_thr enter one global top-k down to
    ``nms_topk``; class-aware NMS emits max_per_img fixed slots + validity.
    """
    nms_cfg = dict(test_cfg.get("nms", {"type": "nms", "iou_threshold": 0.6}))
    nms_cfg.pop("type", None)
    iou_threshold = float(nms_cfg.pop("iou_threshold", 0.6))
    score_thr = float(test_cfg.get("score_thr", 0.05))
    nms_pre = int(test_cfg.get("nms_pre", 1000))
    max_per_img = int(test_cfg.get("max_per_img", 100))
    nms_topk = int(test_cfg.get("nms_topk", 1024))

    hw = img_shapes.astype(jnp.float32)
    max_shape = (hw[:, 0:1], hw[:, 1:2])  # broadcast over (B, K) coords

    all_boxes, all_scores = [], []
    for lvl, (cls_map, reg_map) in enumerate(zip(cls_list, reg_list)):
        b = cls_map.shape[0]
        n_l = anchors_per_level[lvl].shape[0]
        c = cls_map.reshape(b, n_l, -1).shape[-1]
        scores = jax.nn.sigmoid(cls_map.reshape(b, n_l, c))
        if factor_list is not None:
            factors = jax.nn.sigmoid(factor_list[lvl].reshape(b, n_l))
            scores = scores * factors[..., None]
        regs = reg_map.reshape(b, n_l, 4)
        anchors_j = jnp.broadcast_to(
            jnp.asarray(anchors_per_level[lvl])[None], (b, n_l, 4)
        )
        if n_l > nms_pre:
            row_rank = scores.max(axis=-1)  # (B, n_l)
            _, top_idx = jax.lax.top_k(row_rank, nms_pre)
            g_anchors, g_regs, g_scores = _select_rows(
                top_idx, [anchors_j, regs, scores], n_l
            )
        else:
            g_anchors, g_regs, g_scores = anchors_j, regs, scores
        boxes = decode_fn(g_anchors, g_regs, max_shape=max_shape)
        all_boxes.append(boxes)
        all_scores.append(g_scores)

    boxes = jnp.concatenate(all_boxes, axis=1)  # (B, K, 4)
    scores = jnp.concatenate(all_scores, axis=1)  # (B, K, C)
    if rescale:
        boxes = boxes / scale_factors[:, None, :]

    b, k, c = scores.shape
    masked = jnp.where(scores > score_thr, scores, NEG_INF)
    if not with_nms:
        return Detections(
            boxes=boxes,
            scores=scores.max(axis=-1),
            labels=jnp.argmax(scores, axis=-1).astype(jnp.int32),
            valid=(masked > NEG_INF).any(axis=-1),
        )
    kk = min(nms_topk, k * c)
    top_scores, pair_idx = jax.lax.top_k(masked.reshape(b, k * c), kk)
    box_idx = pair_idx // c
    labels = (pair_idx % c).astype(jnp.int32)
    valid = top_scores > NEG_INF
    (g_boxes,) = _select_rows(box_idx, [boxes], k)
    nms_fn = functools.partial(
        batched_nms_device, iou_threshold=iou_threshold, max_out=max_per_img
    )
    ob, ol, osc, ov = jax.vmap(nms_fn)(
        g_boxes, jnp.where(valid, top_scores, 0.0), labels, valid
    )
    return Detections(boxes=ob, scores=osc, labels=ol, valid=ov)


def get_bboxes(
    cls_list,
    reg_list,
    iou_list,
    anchors_per_level,
    img_shapes,  # (B, 2) resized image (h, w) for border clamping
    scale_factors,  # (B, 4) (w_scale, h_scale, w_scale, h_scale)
    *,
    test_cfg: dict,
    normalizer: float = 1.0 / 8.0,
    rescale: bool = True,
    with_nms: bool = True,
) -> Detections:
    """Full batched postprocessing; returns fixed-size Detections.

    ``with_nms=False`` returns the decoded candidate set (scores = cls*iou,
    no suppression) — the reference's proposal path for downstream pose
    stages (radet_head.py:165-169)."""
    nms_cfg = dict(test_cfg.get("nms", {"type": "vote", "iou_threshold": 0.65}))
    nms_type = nms_cfg.pop("type", "vote")
    score_thr = float(test_cfg.get("score_thr", 0.05))
    nms_pre = int(test_cfg.get("nms_pre", 1000))
    max_per_img = int(test_cfg.get("max_per_img", 100))
    # candidates entering NMS are pre-reduced to the global top-k by cluster
    # score: bounds the O(K^2) IoU matrix of the parallel-greedy NMS.  In
    # practice far fewer than 1024 candidates pass score_thr=0.05.
    nms_topk = int(test_cfg.get("nms_topk", 1024))
    nms_impl = str(test_cfg.get("nms_impl", "fast"))  # 'fast' | 'scan'
    candidate_mode = str(test_cfg.get("candidate_mode", "global"))

    if candidate_mode == "global":
        boxes, cls_s, iou_s, labels, valid, cand_anchors = select_candidates_global(
            cls_list,
            reg_list,
            iou_list,
            anchors_per_level,
            img_shapes,
            score_thr=score_thr,
            topk=nms_topk,
            normalizer=normalizer,
            use_approx_topk=bool(test_cfg.get("approx_topk", True)),
            approx_recall=float(test_cfg.get("approx_recall", 0.95)),
        )
    else:
        boxes, cls_s, iou_s, labels, valid, cand_anchors = select_candidates(
            cls_list,
            reg_list,
            iou_list,
            anchors_per_level,
            img_shapes,
            score_thr=score_thr,
            nms_pre=nms_pre,
            normalizer=normalizer,
        )
    # min_bbox_size filter in network-input coordinates, BEFORE rescale
    # (mmdet filters pre-rescale)
    min_bbox_size = float(test_cfg.get("min_bbox_size", 0))
    if min_bbox_size > 0:
        wh_ok = ((boxes[..., 2] - boxes[..., 0]) >= min_bbox_size) & (
            (boxes[..., 3] - boxes[..., 1]) >= min_bbox_size
        )
        valid = valid & wh_ok

    if rescale:
        boxes = boxes / scale_factors[:, None, :]

    if not with_nms:
        scores = cls_s * iou_s
        return Detections(
            boxes=boxes, scores=scores, labels=labels, valid=valid,
            anchors=cand_anchors,
        )

    iou_threshold = float(nms_cfg.pop("iou_threshold", 0.6))
    if nms_type in ("vote", "global_vote"):
        cluster_score = _resolve_score(
            nms_cfg.pop("cluster_score", "cls"), cls_s, iou_s
        )
        vote_score = _resolve_score(nms_cfg.pop("vote_score", "iou"), cls_s, iou_s)
        iou_enable = bool(nms_cfg.pop("iou_enable", False))
        sigma = float(nms_cfg.pop("sigma", 0.025))

        k = boxes.shape[1]
        # Reduce to the top nms_topk by CLUSTER score.  Both device NMS fast
        # paths want cluster-score-descending index order (candidates arrive
        # sorted by cls score only), so the top-k runs even when nms_topk>=k:
        # a K-of-K top_k is a cheap sort and lets the NMS skip its own
        # argsort + five per-row gathers (presorted=True).
        presorted = False
        if nms_impl in ("fast", "pallas"):
            kk = min(nms_topk, k)
            masked = jnp.where(valid, cluster_score, NEG_INF)
            _, top_idx = jax.lax.top_k(masked, kk)  # (B, kk) sorted desc
            boxes, cluster_score, vote_score, flabels, fvalid = _select_rows(
                top_idx,
                [boxes, cluster_score, vote_score,
                 labels.astype(jnp.float32), valid.astype(jnp.float32)],
                k,
            )
            labels = flabels.astype(jnp.int32)
            valid = fvalid > 0.5
            presorted = True

        if nms_impl == "pallas":
            from ..ops.pallas_nms import vote_nms_pallas

            # the kernel expects candidates sorted by cluster score desc —
            # the unconditional top-k above provides exactly that for either
            # candidate mode
            ob, ol, osc, ov = vote_nms_pallas(
                boxes,
                cluster_score,
                vote_score,
                labels,
                valid,
                iou_threshold=iou_threshold,
                max_out=max_per_img,
                iou_enable=iou_enable,
                sigma=sigma,
                global_mode=(nms_type == "global_vote"),
            )
        else:
            if nms_impl == "fast":
                nms_fn = functools.partial(
                    vote_nms_device_fast,
                    iou_threshold=iou_threshold,
                    max_out=max_per_img,
                    iou_enable=iou_enable,
                    sigma=sigma,
                    global_mode=(nms_type == "global_vote"),
                    presorted=presorted,
                )
            else:
                nms_fn = functools.partial(
                    vote_nms_device,
                    iou_threshold=iou_threshold,
                    max_out=max_per_img,
                    iou_enable=iou_enable,
                    sigma=sigma,
                    global_mode=(nms_type == "global_vote"),
                )
            ob, ol, osc, ov = jax.vmap(nms_fn)(
                boxes, cluster_score, vote_score, labels, valid
            )
    else:
        ranked = cls_s * iou_s
        nms_fn = functools.partial(
            batched_nms_device, iou_threshold=iou_threshold, max_out=max_per_img
        )
        ob, ol, osc, ov = jax.vmap(nms_fn)(boxes, ranked, labels, valid)
    return Detections(boxes=ob, scores=osc, labels=ol, valid=ov)
