"""RADet head loss — a pure jitted function over flat head outputs.

Semantic parity with RADetHead.loss
(/root/reference/radet/models/dense_heads/radet_head.py:173-288):

- focal classification loss over ALL cells with per-cell weights (positives:
  sample multiplicity; negatives: 1; ignores: 0), ``avg_factor = num_pos +
  num_imgs`` where num_pos is the positive weight SUM (:254-259);
- GIoU box loss on decoded boxes, per-positive weight = detached
  IoU(pred, target) * cell weight, avg_factor = that weight's sum (:261-274)
  (decode(encode(gt)) is the identity, so the decoded target IS the gt box);
- IoU-quality branch: BCE with the detached IoU as soft target, weighted by
  the cell weight (:275-278).

Unlike the reference (per-image python loops + index gathers producing
dynamic shapes), everything here is dense masked arithmetic over the static
(B, N) anchor grid — the shape XLA wants.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.box_coder import tblr_decode
from ..core.box_ops import bbox_iou_aligned
from ..ops.losses import BBOX_LOSS_FNS, bce_with_logits, sigmoid_focal_loss

EPS = 1e-12


def radet_loss(
    cls_flat,  # (B, N, C) logits
    reg_flat,  # (B, N, 4) tblr predictions (already ReLU'd)
    iou_flat,  # (B, N) logits
    anchors,  # (N, 4)
    gt_boxes,  # (B, G, 4)
    gt_labels,  # (B, G) int32
    gt_idx,  # (B, N) int32: >=0 pos, -1 neg, -2 ignore
    weight,  # (B, N) float32
    *,
    num_classes: int,
    normalizer: float = 1.0 / 8.0,
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    cls_loss_weight: float = 1.0,
    bbox_loss_weight: float = 2.0,
    iou_loss_weight: float = 1.0,
    bbox_loss_type: str = "GIoULoss",  # any BBOX_LOSS_FNS key (config surface)
    bbox_loss_extra: tuple = (),  # extra kwargs as (key, value) pairs
) -> Dict[str, jnp.ndarray]:
    b, n, c = cls_flat.shape
    num_imgs = b

    pos = gt_idx >= 0  # (B, N)
    ignore = gt_idx == -2
    safe_idx = jnp.clip(gt_idx, 0)
    # Gathering per-cell GT attributes via take_along_axis lowers to a
    # VMEM-read-bound gather fusion that dominates the whole train step on
    # TPU (measured 5.9 ms of a 53 ms step at B=16, N=6400).  G is tiny, so
    # select the rows with a one-hot matmul instead — an MXU-friendly
    # (B,N,G)x(B,G,k) batched contraction costing ~nothing.
    g = gt_boxes.shape[1]
    onehot = (safe_idx[..., None] == jnp.arange(g)[None, None, :]).astype(
        jnp.float32
    )  # (B, N, G)
    # positives (and ignores, harmlessly) get their GT's class; negatives get
    # the background index `num_classes`.  Labels are small ints — exact in f32.
    assigned_labels = jnp.einsum(
        "bng,bg->bn",
        onehot,
        gt_labels.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,  # MXU default rounds to bf16
    ).astype(gt_labels.dtype)
    labels = jnp.where(pos | ignore, assigned_labels, num_classes)
    cls_weight = jnp.where(ignore, 0.0, weight)

    pos_w = jnp.where(pos, weight, 0.0)
    num_pos = pos_w.sum()

    loss_cls = sigmoid_focal_loss(
        cls_flat.reshape(-1, c),
        labels.reshape(-1),
        cls_weight.reshape(-1),
        num_classes=num_classes,
        gamma=focal_gamma,
        alpha=focal_alpha,
        avg_factor=num_pos + num_imgs,
        loss_weight=cls_loss_weight,
    )

    target_boxes = jnp.einsum(
        "bng,bgk->bnk", onehot, gt_boxes, precision=jax.lax.Precision.HIGHEST
    )  # (B, N, 4)
    decoded = tblr_decode(anchors[None], reg_flat, normalizer=normalizer)
    iou_target = jax.lax.stop_gradient(bbox_iou_aligned(decoded, target_boxes))

    bbox_w = jnp.where(pos, jnp.clip(iou_target, EPS) * weight, 0.0)
    bbox_loss_fn = BBOX_LOSS_FNS[bbox_loss_type]
    loss_bbox = bbox_loss_fn(
        decoded,
        target_boxes,
        weight=bbox_w,
        avg_factor=bbox_w.sum(),
        loss_weight=bbox_loss_weight,
        **dict(bbox_loss_extra),
    )
    loss_iou = bce_with_logits(
        iou_flat,
        iou_target,
        weight=pos_w,
        avg_factor=num_pos,
        loss_weight=iou_loss_weight,
    )
    return dict(
        loss_cls=loss_cls,
        loss_bbox=loss_bbox,
        loss_iou=loss_iou,
        num_pos=num_pos,
    )
