"""TBLR box coder (jnp), matching the reference TBLRBBoxCoder.

Reference: /root/reference/radet/core/bbox/coder/tblr_bbox_coder.py:71-172.
Encoded layout is (top, bottom, left, right) offsets from the anchor center,
normalized by anchor height (t, b) / width (l, r), then divided by
``normalizer`` (RADet uses 1/8, i.e. the encoded values end up in units of the
level stride because anchors are squares of side 8*stride).
"""

from __future__ import annotations

import jax.numpy as jnp


def tblr_encode(anchors, gt_boxes, normalizer: float = 1.0 / 8.0):
    """Encode gt xyxy boxes against anchor xyxy boxes. Shapes (..., 4)."""
    cx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    cy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    top = (cy - gt_boxes[..., 1]) / h
    bottom = (gt_boxes[..., 3] - cy) / h
    left = (cx - gt_boxes[..., 0]) / w
    right = (gt_boxes[..., 2] - cx) / w
    return jnp.stack([top, bottom, left, right], axis=-1) / normalizer


def tblr_decode(anchors, tblr, normalizer: float = 1.0 / 8.0, max_shape=None):
    """Decode (t, b, l, r) predictions back to xyxy boxes.

    Args:
        anchors: (..., 4) xyxy anchors.
        tblr: (..., 4) encoded offsets.
        max_shape: optional (h, w) for border clamping — may be traced arrays
            (per-image shapes) or python ints.
    """
    loc = tblr * normalizer
    cx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    cy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    top = loc[..., 0] * h
    bottom = loc[..., 1] * h
    left = loc[..., 2] * w
    right = loc[..., 3] * w
    x1 = cx - left
    y1 = cy - top
    x2 = cx + right
    y2 = cy + bottom
    if max_shape is not None:
        hmax, wmax = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, wmax)
        x2 = jnp.clip(x2, 0, wmax)
        y1 = jnp.clip(y1, 0, hmax)
        y2 = jnp.clip(y2, 0, hmax)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
