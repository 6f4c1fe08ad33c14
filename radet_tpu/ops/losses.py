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

from ..core.box_ops import bbox_giou_aligned, bbox_iou_aligned


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


def _weighted_total(loss, weight, avg_factor, loss_weight):
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total * loss_weight


def giou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None, loss_weight: float = 2.0):
    """GIoU loss (1 - GIoU) over aligned xyxy boxes."""
    loss = 1.0 - bbox_giou_aligned(pred_boxes, target_boxes)
    return _weighted_total(loss, weight, avg_factor, loss_weight)


def iou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
             loss_weight: float = 2.0, linear: bool = False, eps: float = 1e-6):
    """Plain IoU loss: -log(IoU) or linear 1-IoU
    (reference losses/iou_loss.py:12-34)."""
    ious = jnp.clip(bbox_iou_aligned(pred_boxes, target_boxes), eps)
    loss = (1.0 - ious) if linear else -jnp.log(ious)
    return _weighted_total(loss, weight, avg_factor, loss_weight)


def bounded_iou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
                     loss_weight: float = 2.0, beta: float = 0.2,
                     eps: float = 1e-3):
    """Bounded IoU loss (reference losses/iou_loss.py:38-79; Fitness-NMS
    paper).  The per-box loss is the SUM of the four smooth-L1'd bound
    terms — the scale mmdet's @weighted_loss produces when the (n,4)
    elementwise tensor is weighted and sum-reduced."""
    px = (pred_boxes[..., 0] + pred_boxes[..., 2]) * 0.5
    py = (pred_boxes[..., 1] + pred_boxes[..., 3]) * 0.5
    pw = pred_boxes[..., 2] - pred_boxes[..., 0]
    ph = pred_boxes[..., 3] - pred_boxes[..., 1]
    t = jax.lax.stop_gradient(target_boxes)
    tx = (t[..., 0] + t[..., 2]) * 0.5
    ty = (t[..., 1] + t[..., 3]) * 0.5
    tw = t[..., 2] - t[..., 0]
    th = t[..., 3] - t[..., 1]
    dx = tx - px
    dy = ty - py
    loss_dx = 1.0 - jnp.maximum((tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0.0)
    loss_dy = 1.0 - jnp.maximum((th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0.0)
    loss_dw = 1.0 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1.0 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta, comb - 0.5 * beta)
    return _weighted_total(loss.sum(axis=-1), weight, avg_factor, loss_weight)


def _diou_terms(pred, target, eps):
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    ious = overlap / (ap + ag - overlap + eps)
    enc_wh = jnp.clip(jnp.maximum(pred[..., 2:], target[..., 2:])
                      - jnp.minimum(pred[..., :2], target[..., :2]), 0.0)
    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps
    rho2 = (((target[..., 0] + target[..., 2]) - (pred[..., 0] + pred[..., 2])) ** 2
            + ((target[..., 1] + target[..., 3]) - (pred[..., 1] + pred[..., 3])) ** 2) / 4.0
    return ious, rho2, c2


def diou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
              loss_weight: float = 2.0, eps: float = 1e-7):
    """Distance-IoU loss (reference losses/iou_loss.py:102-152)."""
    ious, rho2, c2 = _diou_terms(pred_boxes, target_boxes, eps)
    loss = 1.0 - (ious - rho2 / c2)
    return _weighted_total(loss, weight, avg_factor, loss_weight)


def ciou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
              loss_weight: float = 2.0, eps: float = 1e-7):
    """Complete-IoU loss (reference losses/iou_loss.py:156-213; the aspect
    term uses this mmdet version's v**2/(1-iou+v) form, alpha un-detached)."""
    ious, rho2, c2 = _diou_terms(pred_boxes, target_boxes, eps)
    w1 = pred_boxes[..., 2] - pred_boxes[..., 0]
    h1 = pred_boxes[..., 3] - pred_boxes[..., 1] + eps
    w2 = target_boxes[..., 2] - target_boxes[..., 0]
    h2 = target_boxes[..., 3] - target_boxes[..., 1] + eps
    factor = 4.0 / (jnp.pi ** 2)
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    # dense masked evaluation: guard the 0/0 at (iou==1, v==0) — the term's
    # limit is 0 there; double-where keeps the gradient NaN-free too
    denom = 1.0 - ious + v
    safe = jnp.where(denom > 0, denom, 1.0)
    aspect = jnp.where(denom > 0, v ** 2 / safe, 0.0)
    loss = 1.0 - (ious - (rho2 / c2 + aspect))
    return _weighted_total(loss, weight, avg_factor, loss_weight)


def l1_box_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
                loss_weight: float = 2.0):
    """L1 on decoded xyxy boxes (reference losses/smooth_l1_loss.py:46-56 used
    as ``loss_bbox``): the per-box (n,) weight broadcasts over the 4 coords,
    matching mmdet's weight-expansion convention."""
    w = None if weight is None else weight[..., None]
    return l1_loss(pred_boxes, target_boxes, weight=w,
                   avg_factor=avg_factor, loss_weight=loss_weight)


def smooth_l1_box_loss(pred_boxes, target_boxes, weight=None, avg_factor=None,
                       loss_weight: float = 2.0, beta: float = 1.0):
    """Smooth-L1 on decoded xyxy boxes (same weight expansion as L1)."""
    w = None if weight is None else weight[..., None]
    return smooth_l1_loss(pred_boxes, target_boxes, beta=beta, weight=w,
                          avg_factor=avg_factor, loss_weight=loss_weight)


#: config `loss_bbox.type` -> implementation (reference mmdet LOSSES registry
#: entries reachable from a RADet config)
BBOX_LOSS_FNS = {
    "GIoULoss": giou_loss,
    "IoULoss": iou_loss,
    "BoundedIoULoss": bounded_iou_loss,
    "DIoULoss": diou_loss,
    "CIoULoss": ciou_loss,
    "L1Loss": l1_box_loss,
    "SmoothL1Loss": smooth_l1_box_loss,
}


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
