"""Loss primitives as plain jnp functions — XLA fuses them into the step.

Replaces the reference's CUDA ``mmcv.ops.sigmoid_focal_loss``
(/root/reference/radet/models/losses/focal_loss.py:3-80), GIoULoss
(losses/iou_loss.py:83-430) and binary CrossEntropyLoss used for the IoU
quality branch.  All reductions follow mmdet's ``weight_reduce_loss`` with
``reduction='sum'`` + explicit ``avg_factor`` division, which is what
RADetHead.loss uses (/root/reference/radet/models/dense_heads/radet_head.py:
256-278).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box_ops import bbox_giou_aligned


def sigmoid_focal_loss(
    logits,
    labels,
    weight=None,
    *,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor=None,
    loss_weight: float = 1.0,
):
    """Multi-class sigmoid focal loss.

    Args:
        logits: (N, C) raw scores.
        labels: (N,) int class indices; ``label == num_classes`` is background
            (all-zero one-hot target), mmdet convention.
        weight: (N,) per-anchor weight or None.
    Returns scalar: sum(focal * weight) / avg_factor * loss_weight.
    """
    labels = labels.astype(jnp.int32)
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)  # bg -> zeros
    p = jax.nn.sigmoid(logits)
    # numerically-stable BCE with logits
    ce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = p * target + (1.0 - p) * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * jnp.power(
        1.0 - pt, gamma
    )
    loss = ce * focal_weight
    loss = loss.sum(axis=-1)
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def giou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None, loss_weight: float = 2.0):
    """GIoU loss (1 - GIoU) over aligned xyxy boxes."""
    loss = 1.0 - bbox_giou_aligned(pred_boxes, target_boxes)
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def bce_with_logits(logits, targets, weight=None, avg_factor=None, loss_weight: float = 1.0):
    """Binary cross-entropy with logits and (possibly soft) targets."""
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        ce = ce * weight
    total = ce.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def smooth_l1_loss(pred, target, beta: float = 1.0, weight=None, avg_factor=None, loss_weight: float = 1.0):
    """Smooth L1 (reference losses/smooth_l1_loss.py semantics)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def l1_loss(pred, target, weight=None, avg_factor=None, loss_weight: float = 1.0):
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def accuracy(logits, labels, topk: int = 1):
    """Top-k classification accuracy (reference losses/accuracy.py)."""
    top = jnp.argsort(-logits, axis=-1)[..., :topk]
    correct = (top == labels[..., None]).any(axis=-1)
    return correct.mean()
