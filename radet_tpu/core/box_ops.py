"""Box IoU/GIoU and format helpers (jnp; shape-polymorphic, fully vectorized).

Reference semantics: /root/reference/radet/core/bbox/iou_calculators/
iou2d_calculator.py (bbox_overlaps, aligned and pairwise modes).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def bbox_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def bbox_iou_aligned(a, b, eps: float = EPS):
    """Element-wise IoU of equal-shaped (..., 4) xyxy box arrays."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a) + bbox_area(b) - inter
    return inter / jnp.maximum(union, eps)


def bbox_giou_aligned(a, b, eps: float = EPS):
    """Element-wise GIoU of equal-shaped (..., 4) xyxy box arrays."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a) + bbox_area(b) - inter
    iou = inter / jnp.maximum(union, eps)
    enclose_lt = jnp.minimum(a[..., :2], b[..., :2])
    enclose_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    enclose_wh = jnp.clip(enclose_rb - enclose_lt, 0)
    enclose = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return iou - (enclose - union) / enclose


def bbox_iou_pairwise(a, b, eps: float = EPS):
    """Pairwise IoU: a (..., N, 4) x b (..., M, 4) -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a)[..., :, None] + bbox_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, eps)


def bbox_giou_pairwise(a, b, eps: float = EPS):
    """Pairwise GIoU: a (..., N, 4) x b (..., M, 4) -> (..., N, M)
    (reference iou2d_calculator.py bbox_overlaps mode='giou')."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a)[..., :, None] + bbox_area(b)[..., None, :] - inter
    iou = inter / jnp.maximum(union, eps)
    e_lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    e_rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    e_wh = jnp.clip(e_rb - e_lt, 0)
    enclose = jnp.maximum(e_wh[..., 0] * e_wh[..., 1], eps)
    return iou - (enclose - union) / enclose


def bbox_iof_pairwise(a, b, eps: float = EPS):
    """Pairwise intersection-over-foreground: intersection normalized by the
    area of ``a`` (reference bbox_overlaps mode='iof')."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(bbox_area(a)[..., :, None], eps)


def xyxy_to_xywh(boxes):
    return jnp.stack(
        [
            boxes[..., 0],
            boxes[..., 1],
            boxes[..., 2] - boxes[..., 0],
            boxes[..., 3] - boxes[..., 1],
        ],
        axis=-1,
    )


def xywh_to_xyxy(boxes):
    return jnp.stack(
        [
            boxes[..., 0],
            boxes[..., 1],
            boxes[..., 0] + boxes[..., 2],
            boxes[..., 1] + boxes[..., 3],
        ],
        axis=-1,
    )
