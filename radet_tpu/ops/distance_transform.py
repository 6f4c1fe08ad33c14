"""Mask-free distance-map estimation (the reference bbox2distance path).

Implements GenerateDistanceMap's no-mask branch
(/root/reference/radet/datasets/pipelines/loading.py:586-645 with the
wrappers radet/ops/bbox2distance/bbox2distance_wrapper.py):

for each GT box — pad the crop by ``pad_ratio`` filling out-of-image area
with a random color, gate by ``small_object_size``; resize so the short edge
is 150 px and Gaussian-blur; then estimate per-pixel object-likelihood as the
Minimum-Barrier or Geodesic (over Sobel edges) distance from border seeds
(native C++ ops, pure-numpy fallback); finally crop the padding away and
paste into an image-sized map.

Higher value = farther from background = more likely on the object; the
label-assignment sampler uses these as sampling probabilities.
"""

from __future__ import annotations

import math
import random
from typing import List

import cv2
import numpy as np

from . import native


# ---------------------------------------------------------------------------
# pure-numpy fallbacks (slow; used when no compiler is available, and as the
# differential-test oracle for the native kernels)
# ---------------------------------------------------------------------------


def mbd_numpy(image, seeds_x, seeds_y, alpha=0.1, niter=4, base_size=300):
    h, w = image.shape[:2]
    size_factor = 400.0 if h * w < base_size ** 2 else 400.0 * (w * h / (base_size ** 2))
    factor = alpha * alpha / size_factor
    img = image.astype(np.int32)
    label = np.full((h, w), -1, np.int32)
    dmap = np.full((h, w), 255.0, np.float64)
    hi = img.copy()
    lo = img.copy()
    label[seeds_y, seeds_x] = np.arange(len(seeds_x))
    dmap[seeds_y, seeds_x] = 0.0
    sx = np.asarray(seeds_x, np.float64)
    sy = np.asarray(seeds_y, np.float64)
    for it in range(niter):
        fwd = it % 2 == 0
        ys = range(h) if fwd else range(h - 1, -1, -1)
        xs = range(w) if fwd else range(w - 1, -1, -1)
        offs = [(-1, 0), (0, -1)] if fwd else [(1, 0), (0, 1)]
        for y in ys:
            for x in xs:
                for dx, dy in offs:
                    nx, ny = x + dx, y + dy
                    if not (0 <= nx < w and 0 <= ny < h):
                        continue
                    nl = label[ny, nx]
                    if nl < 0:
                        continue
                    mx = np.maximum(hi[ny, nx], img[y, x])
                    mn = np.minimum(lo[ny, nx], img[y, x])
                    cost = ((mx - mn).max() / 255.0) ** 2
                    cost += factor * ((sy[nl] - y) ** 2 + (sx[nl] - x) ** 2)
                    if cost < dmap[y, x]:
                        dmap[y, x] = cost
                        label[y, x] = nl
                        hi[y, x] = mx
                        lo[y, x] = mn
    return dmap


def gdt_numpy(cost, seeds_x, seeds_y):
    h, w = cost.shape
    c1, c2 = 0.5, math.sqrt(2.0) / 2.0
    dist = np.full((h, w), 255.0, np.float32)
    dist[seeds_y, seeds_x] = cost[seeds_y, seeds_x]

    def relax(cy, cx, py, px, coef):
        d = dist[py, px] + coef * (cost[cy, cx] + cost[py, px])
        if dist[cy, cx] > d:
            dist[cy, cx] = d

    for j in range(1, w):
        relax(0, j, 0, j - 1, c1)
    for i in range(1, h):
        relax(i, 0, i - 1, 0, c1)
        if w > 1:
            relax(i, 0, i - 1, 1, c2)
        for j in range(1, w - 1):
            relax(i, j, i, j - 1, c1)
            relax(i, j, i - 1, j - 1, c2)
            relax(i, j, i - 1, j, c1)
            relax(i, j, i - 1, j + 1, c2)
        if w > 1:
            j = w - 1
            relax(i, j, i, j - 1, c1)
            relax(i, j, i - 1, j - 1, c2)
            relax(i, j, i - 1, j, c1)
    for j in range(w - 2, -1, -1):
        relax(h - 1, j, h - 1, j + 1, c1)
    for i in range(h - 2, -1, -1):
        j = w - 1
        relax(i, j, i + 1, j, c1)
        if w > 1:
            relax(i, j, i + 1, j - 1, c2)
        for j in range(w - 2, 0, -1):
            relax(i, j, i, j + 1, c1)
            relax(i, j, i + 1, j + 1, c2)
            relax(i, j, i + 1, j, c1)
            relax(i, j, i + 1, j - 1, c2)
        if w > 1:
            relax(i, 0, i, 1, c1)
            relax(i, 0, i + 1, 1, c2)
            relax(i, 0, i + 1, 0, c1)
    return dist


# ---------------------------------------------------------------------------
# shared machinery
# ---------------------------------------------------------------------------


def border_seeds(h: int, w: int, interval: int = 3):
    """Border seed points (bbox2distance_wrapper.py:22-36)."""
    hx = list(range(0, w, interval))
    if hx[-1] != w - 1:
        hx.append(w - 1)
    hx = np.asarray(hx, np.int64)
    vy = np.arange(1, h - 1, interval, dtype=np.int64)
    seeds_x = np.concatenate([hx, hx, np.zeros_like(vy), np.full_like(vy, w - 1)])
    seeds_y = np.concatenate([np.zeros_like(hx), np.full_like(hx, h - 1), vy, vy])
    return seeds_x, seeds_y


def sobel_edges(image: np.ndarray) -> np.ndarray:
    """Sobel edge-cost map (bbox2distance_wrapper.py:118-130)."""
    src = cv2.GaussianBlur(image, (3, 3), 0)
    gray = cv2.cvtColor(src, cv2.COLOR_RGB2GRAY)
    ex = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    ey = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    edge = np.abs(cv2.addWeighted(ex, 0.5, ey, 0.5, 0))
    m = edge.max()
    return edge / m if m > 0 else edge


def _estimate_dmap(box_image: np.ndarray, method: str, alpha: float, niter: int,
                   base_size: int, interval: int, resize_short: int = 150) -> np.ndarray:
    """Short-edge-150 resize + blur + distance transform, back at full size."""
    h, w = box_image.shape[:2]
    ratio = resize_short / max(1, min(h, w))
    nw, nh = max(2, int(w * ratio)), max(2, int(h * ratio))
    small = cv2.resize(box_image, (nw, nh))
    small = cv2.GaussianBlur(small, (9, 9), 0)
    sx, sy = border_seeds(nh, nw, interval)
    use_native = native.load() is not None
    if method == "mbd":
        if use_native:
            dmap = native.mbd(small, sx, sy, alpha, niter, base_size)
        else:
            dmap = mbd_numpy(small, sx, sy, alpha, niter, base_size)
    elif method == "gdt":
        cost = sobel_edges(small)
        if use_native:
            dmap = native.gdt(cost, sx, sy)
        else:
            dmap = gdt_numpy(cost, sx, sy)
    else:
        raise ValueError(f"unknown distance transform {method!r}")
    return cv2.resize(dmap.astype(np.float32), (w, h))


def boxes_to_distance_maps(
    img: np.ndarray,
    gt_bboxes: np.ndarray,
    method: str = "gdt",
    small_object_size: float = 32 ** 2,
    pad_ratio: float = 0.05,
    alpha: float = 0.1,
    niter: int = 4,
    base_size: int = 300,
    interval: int = 3,
) -> np.ndarray:
    """Per-GT distance maps in image frame. img: HxWx3 uint8 RGB.

    Returns (G, H, W) float32; zero outside each GT's box; small objects get
    a uniform map inside their box (loading.py:598-600 maskenable gating).
    """
    img_h, img_w = img.shape[:2]
    out = np.zeros((len(gt_bboxes), img_h, img_w), np.float32)
    for g, bbox in enumerate(gt_bboxes):
        x1, y1, x2, y2 = [int(v) for v in bbox]
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(img_w, x2), min(img_h, y2)
        bw, bh = x2 - x1, y2 - y1
        if bw <= 1 or bh <= 1:
            continue
        area = (bw + 1) * (bh + 1)
        if area <= small_object_size:
            out[g, y1:y2, x1:x2] = 1.0
            continue
        # pad the crop, filling out-of-image regions with a random color
        # (loading.py:602-637)
        px = math.ceil(bw * pad_ratio)
        py = math.ceil(bh * pad_ratio)
        ph, pw = bh + 2 * py, bw + 2 * px
        box_img = np.empty((ph, pw, 3), np.uint8)
        box_img[:] = [random.randint(0, 255) for _ in range(3)]
        sx1, sy1 = max(0, x1 - px), max(0, y1 - py)
        sx2, sy2 = min(img_w, x2 + px), min(img_h, y2 + py)
        dx1, dy1 = sx1 - (x1 - px), sy1 - (y1 - py)
        box_img[dy1 : dy1 + (sy2 - sy1), dx1 : dx1 + (sx2 - sx1)] = img[sy1:sy2, sx1:sx2]

        dmap = _estimate_dmap(box_img, method, alpha, niter, base_size, interval)
        # crop the padding away -> actual box region
        inner = dmap[py : py + bh, px : px + bw]
        m = inner.max()
        if m > 0:
            inner = inner / m
        out[g, y1:y2, x1:x2] = inner
    return out
