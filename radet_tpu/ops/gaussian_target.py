"""Gaussian heatmap targets (CenterNet/CornerNet-style), TPU-native.

Re-designs the reference's ``radet/models/utils/gaussian_target.py``:

- ``gaussian_radius``     (reference gaussian_target.py:67-185) — vectorized
  over N boxes instead of scalar python.
- ``gen_gaussian_target`` (reference gaussian_target.py:30-64) — the
  reference dynamically slices a ``(2r+1, 2r+1)`` kernel into the heatmap
  per center, which is shape-dynamic and unjittable.  Here each center's
  gaussian is evaluated over the FULL (H, W) grid (branch-free VPU math),
  restricted to the reference's ``|dx|<=r, |dy|<=r`` kernel support and its
  ``h < eps * h.max()`` cutoff, then max-reduced over centers and with the
  input heatmap — bitwise the same maximum-composition semantics, static
  shapes, one fused kernel under jit.

No shipped reference config reaches these (dead code via mmdet registries,
SURVEY §2.2), but they complete the ``models/utils`` surface so
CenterNet-family heads can be built on this framework.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# torch.finfo(torch.float32).eps — the reference's kernel cutoff
_F32_EPS = float(np.finfo(np.float32).eps)


def gaussian_radius(det_sizes, min_overlap: float):
    """Minimum gaussian radius keeping IoU >= min_overlap for corner jitter.

    Vectorized transcription of the three CornerNet quadratic cases
    (reference gaussian_target.py:67-185, itself from CornerNet-Lite).

    Args:
        det_sizes: (..., 2) array-like of (height, width).
        min_overlap: scalar IoU bound in (0, 1).
    Returns:
        (...,) f32 radii (un-floored, like the reference).
    """
    det_sizes = jnp.asarray(det_sizes, jnp.float32)
    height, width = det_sizes[..., 0], det_sizes[..., 1]

    b1 = height + width
    c1 = width * height * (1.0 - min_overlap) / (1.0 + min_overlap)
    r1 = (b1 - jnp.sqrt(b1 * b1 - 4.0 * c1)) / 2.0

    b2 = 2.0 * (height + width)
    c2 = (1.0 - min_overlap) * width * height
    r2 = (b2 - jnp.sqrt(b2 * b2 - 16.0 * c2)) / 8.0

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (height + width)
    c3 = (min_overlap - 1.0) * width * height
    # exactly the reference's (CornerNet-derived) root: (b3 + sqrt)/2a3 with
    # b3 NEGATIVE (gaussian_target.py:180-184).  r3 is never the unique
    # minimum of the three cases, but standalone users of case 3 rely on the
    # published formula, not the algebraically-nicer (-b3 + sqrt) variant.
    r3 = (b3 + jnp.sqrt(b3 * b3 - 4.0 * a3 * c3)) / (2.0 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def gen_gaussian_target(heatmap, centers, radii, k: float = 1.0, valid=None):
    """Splat ``k * gaussian(radius)`` at each center, max-composed.

    Matches the reference's per-center loop (gaussian_target.py:30-64):
    ``sigma = (2r+1)/6``, kernel support the ``(2r+1)^2`` box clipped to the
    map, values below ``f32_eps * max`` zeroed, composed with
    ``maximum``.  All centers splat in one vectorized pass.

    Args:
        heatmap: (H, W) f32 — a single class channel.
        centers: (N, 2) int — (x, y) pixel coords.
        radii: (N,) int/float radii (floored to int like callers do).
        k: amplitude coefficient.
        valid: optional (N,) bool; False rows are skipped (static-shape
            padding support — the reference's python loop just omits them).
    Returns:
        (H, W) updated heatmap.
    """
    heatmap = jnp.asarray(heatmap, jnp.float32)
    h, w = heatmap.shape
    centers = jnp.asarray(centers)
    if centers.shape[0] == 0:  # reference loop over zero centers is a no-op
        return heatmap
    radii = jnp.floor(jnp.asarray(radii, jnp.float32))
    cx = centers[..., 0].astype(jnp.float32)[:, None, None]
    cy = centers[..., 1].astype(jnp.float32)[:, None, None]
    r = radii[:, None, None]

    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    dx = xs - cx  # (N, 1, W) -> broadcast (N, H, W)
    dy = ys - cy
    diameter = 2.0 * r + 1.0
    sigma = diameter / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    # reference kernel support: the (2r+1)^2 box...
    support = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    if valid is not None:
        support = support & jnp.asarray(valid, bool)[:, None, None]
    # ...and gaussian2D's eps cutoff (h.max() == 1 at the center); the
    # cutoff zeroes the VALUE but the pixel stays inside the composed box
    g = jnp.where(g >= _F32_EPS, g, 0.0) * k
    # compose over every pixel some kernel box covers — the reference
    # max-composes g*k (including cutoff zeros, and negatives when k<0) over
    # the clipped box and leaves pixels outside every box untouched
    gm = jnp.where(support, g, -jnp.inf).max(axis=0)
    covered = support.any(axis=0)
    return jnp.where(covered, jnp.maximum(heatmap, gm), heatmap)
