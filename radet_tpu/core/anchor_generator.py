"""Multi-anchor grid generators (the full reference AnchorGenerator family).

Semantics match /root/reference/radet/core/anchor/anchor_generator.py:

- ``AnchorGenerator``        (:10-347)  — scales x ratios (or octave scales)
  base anchors, grid placement, valid flags;
- ``SSDAnchorGenerator``     (:351-471) — basesize_ratio_range-derived
  min/max sizes, per-level scales/ratios, index-reordered base anchors;
- ``LegacyAnchorGenerator``  (:475-570) — mmdet v1.x (w-1)/(h-1) centers,
  rounded corners;
- ``LegacySSDAnchorGenerator``(:574-592);
- ``YOLOAnchorGenerator``    (:596-728) — explicit per-level base sizes +
  responsible flags;
- ``PointGenerator``         (point_generator.py:7-37).

TPU-first design: the input resolution is static, so anchors are plain
numpy arrays computed once on the host and baked into the jitted program as
constants — there is no device anchor kernel to port.  Ordering contract:
per level, anchors are row-major over cells with the A base anchors fastest
("first A rows correspond to A anchors of (0, 0)", reference :269-271),
matching the (B, H, W, A*C) -> (B, H*W*A, C) reshape of the head outputs.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class AnchorGenerator:
    """Standard anchor generator (reference anchor_generator.py:10-347)."""

    def __init__(
        self,
        strides,
        ratios,
        scales=None,
        base_sizes=None,
        scale_major: bool = True,
        octave_base_scale: Optional[float] = None,
        scales_per_octave: Optional[int] = None,
        centers=None,
        center_offset: float = 0.0,
    ):
        if center_offset != 0:
            assert centers is None, (
                f"center cannot be set when center_offset != 0, {centers} given"
            )
        if not (0 <= center_offset <= 1):
            raise ValueError(
                f"center_offset should be in [0, 1], got {center_offset}"
            )
        if centers is not None:
            assert len(centers) == len(strides)

        self.strides = [_pair(s) for s in strides]
        self.base_sizes = (
            [min(s) for s in self.strides] if base_sizes is None else list(base_sizes)
        )
        assert len(self.base_sizes) == len(self.strides)

        assert (octave_base_scale is not None and scales_per_octave is not None) ^ (
            scales is not None
        ), "set either scales or octave_base_scale+scales_per_octave, not both"
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        else:
            octave_scales = np.array(
                [2 ** (i / scales_per_octave) for i in range(scales_per_octave)]
            )
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)

        self.octave_base_scale = octave_base_scale
        self.scales_per_octave = scales_per_octave
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(
                self.gen_single_level_base_anchors(
                    base_size, self.scales, self.ratios, center
                )
            )
        return out

    def gen_single_level_base_anchors(self, base_size, scales, ratios, center=None):
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * w
            y_center = self.center_offset * h
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack(
            [
                x_center - 0.5 * ws,
                y_center - 0.5 * hs,
                x_center + 0.5 * ws,
                y_center + 0.5 * hs,
            ],
            axis=-1,
        ).astype(np.float32)

    def grid_anchors(self, featmap_sizes) -> List[np.ndarray]:
        """Per-level (H*W*A, 4) anchor arrays for the given feature sizes."""
        assert self.num_levels == len(featmap_sizes)
        return [
            self.single_level_grid_anchors(
                self.base_anchors[i], featmap_sizes[i], self.strides[i]
            )
            for i in range(self.num_levels)
        ]

    @staticmethod
    def single_level_grid_anchors(base_anchors, featmap_size, stride):
        feat_h, feat_w = int(featmap_size[0]), int(featmap_size[1])
        shift_x = np.arange(feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(feat_h, dtype=np.float32) * stride[1]
        # row-major: y outer, x inner (reference _meshgrid, :187-204)
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4).astype(np.float32)

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Per-level (H*W*A,) bool flags (reference :273-329)."""
        assert self.num_levels == len(featmap_sizes)
        flags = []
        for i in range(self.num_levels):
            sw, sh = self.strides[i]
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape[:2]
            valid_h = min(int(math.ceil(h / sh)), feat_h)
            valid_w = min(int(math.ceil(w / sw)), feat_w)
            flags.append(
                self.single_level_valid_flags(
                    (feat_h, feat_w), (valid_h, valid_w), self.num_base_anchors[i]
                )
            )
        return flags

    @staticmethod
    def single_level_valid_flags(featmap_size, valid_size, num_base_anchors):
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        vx = np.zeros(feat_w, bool)
        vy = np.zeros(feat_h, bool)
        vx[:valid_w] = True
        vy[:valid_h] = True
        valid = np.tile(vx, feat_h) & np.repeat(vy, feat_w)
        return np.repeat(valid, num_base_anchors)


class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchors (reference anchor_generator.py:351-471)."""

    def __init__(
        self,
        strides,
        ratios,
        basesize_ratio_range,
        input_size: int = 300,
        scale_major: bool = True,
    ):
        assert len(strides) == len(ratios)
        self.strides = [_pair(s) for s in strides]
        self.input_size = input_size
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        self.basesize_ratio_range = tuple(basesize_ratio_range)

        min_ratio, max_ratio = basesize_ratio_range
        min_ratio = int(min_ratio * 100)
        max_ratio = int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (self.num_levels - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(int(min_ratio), int(max_ratio) + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        # the first (highest-resolution) level's sizes are dataset presets
        # (reference :392-417)
        if input_size == 300:
            if basesize_ratio_range[0] == 0.15:  # COCO
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
            elif basesize_ratio_range[0] == 0.2:  # VOC
                min_sizes.insert(0, int(input_size * 10 / 100))
                max_sizes.insert(0, int(input_size * 20 / 100))
            else:
                raise ValueError(
                    "basesize_ratio_range[0] must be 0.15 or 0.2 for input 300, "
                    f"got {basesize_ratio_range[0]}"
                )
        elif input_size == 512:
            if basesize_ratio_range[0] == 0.1:  # COCO
                min_sizes.insert(0, int(input_size * 4 / 100))
                max_sizes.insert(0, int(input_size * 10 / 100))
            elif basesize_ratio_range[0] == 0.15:  # VOC
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
            else:
                raise ValueError(
                    "basesize_ratio_range[0] must be 0.1 or 0.15 for input 512, "
                    f"got {basesize_ratio_range[0]}"
                )
        else:
            raise ValueError(f"only input_size 300 or 512 supported, got {input_size}")

        anchor_ratios, anchor_scales = [], []
        for k in range(len(self.strides)):
            scales = [1.0, float(np.sqrt(max_sizes[k] / min_sizes[k]))]
            anchor_ratio = [1.0]
            for r in ratios[k]:
                anchor_ratio += [1.0 / r, r]
            anchor_ratios.append(np.asarray(anchor_ratio, np.float32))
            anchor_scales.append(np.asarray(scales, np.float32))

        self.base_sizes = min_sizes
        self.scales = anchor_scales
        self.ratios = anchor_ratios
        self.scale_major = scale_major
        self.center_offset = 0.0
        self.base_anchors = self.gen_base_anchors()

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            base = self.gen_single_level_base_anchors(
                base_size, self.scales[i], self.ratios[i], self.centers[i]
            )
            # SSD keeps the sqrt(max/min)-scale square anchor at slot 1
            # (reference index reorder, :450-453)
            indices = list(range(len(self.ratios[i])))
            indices.insert(1, len(indices))
            out.append(base[np.asarray(indices)])
        return out


class LegacyAnchorGenerator(AnchorGenerator):
    """mmdet v1.x anchors: (w-1)/(h-1) centers, rounded corners
    (reference anchor_generator.py:475-570)."""

    def gen_single_level_base_anchors(self, base_size, scales, ratios, center=None):
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * (w - 1)
            y_center = self.center_offset * (h - 1)
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.round(
            np.stack(
                [
                    x_center - 0.5 * (ws - 1),
                    y_center - 0.5 * (hs - 1),
                    x_center + 0.5 * (ws - 1),
                    y_center + 0.5 * (hs - 1),
                ],
                axis=-1,
            )
        ).astype(np.float32)


class LegacySSDAnchorGenerator(SSDAnchorGenerator, LegacyAnchorGenerator):
    """v1.x SSD anchors (reference :574-592): SSD sizes, (stride-1)/2 centers,
    legacy corner math."""

    def __init__(self, strides, ratios, basesize_ratio_range, input_size=300,
                 scale_major=True):
        super().__init__(strides, ratios, basesize_ratio_range, input_size,
                         scale_major)
        self.centers = [((s - 1) / 2.0, (s - 1) / 2.0) for s in strides]
        self.base_anchors = self.gen_base_anchors()


class YOLOAnchorGenerator(AnchorGenerator):
    """YOLO anchors from explicit per-level (w, h) base sizes
    (reference anchor_generator.py:596-728)."""

    def __init__(self, strides, base_sizes):
        self.strides = [_pair(s) for s in strides]
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        self.base_sizes = []
        num_per_level = len(base_sizes[0])
        for sizes_per_level in base_sizes:
            assert num_per_level == len(sizes_per_level)
            self.base_sizes.append([_pair(b) for b in sizes_per_level])
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self):
        return len(self.base_sizes)

    def gen_base_anchors(self):
        out = []
        for i, sizes_per_level in enumerate(self.base_sizes):
            x_center, y_center = self.centers[i]
            boxes = [
                [x_center - 0.5 * w, y_center - 0.5 * h,
                 x_center + 0.5 * w, y_center + 0.5 * h]
                for (w, h) in sizes_per_level
            ]
            out.append(np.asarray(boxes, np.float32))
        return out

    def responsible_flags(self, featmap_sizes, gt_bboxes) -> List[np.ndarray]:
        """Per-level flags marking the grid cell containing each GT center
        (reference :668-728)."""
        assert self.num_levels == len(featmap_sizes)
        gt_bboxes = np.asarray(gt_bboxes, np.float32)
        out = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            sw, sh = self.strides[i]
            cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
            cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
            gx = np.floor(cx / sw).astype(np.int64)
            gy = np.floor(cy / sh).astype(np.int64)
            idx = gy * feat_w + gx
            grid = np.zeros(feat_h * feat_w, bool)
            grid[idx] = True
            out.append(np.repeat(grid, self.num_base_anchors[i]))
        return out


class PointGenerator:
    """Per-cell (x, y, stride) points (reference point_generator.py:7-37)."""

    @staticmethod
    def grid_points(featmap_size, stride: float = 16.0) -> np.ndarray:
        feat_h, feat_w = featmap_size
        shift_x = np.arange(feat_w, dtype=np.float32) * stride
        shift_y = np.arange(feat_h, dtype=np.float32) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        return np.stack([xx, yy, np.full_like(xx, stride)], axis=-1)

    @staticmethod
    def valid_flags(featmap_size, valid_size) -> np.ndarray:
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        assert valid_h <= feat_h and valid_w <= feat_w
        vx = np.zeros(feat_w, bool)
        vy = np.zeros(feat_h, bool)
        vx[:valid_w] = True
        vy[:valid_h] = True
        return np.tile(vx, feat_h) & np.repeat(vy, feat_w)


ANCHOR_GENERATORS = {
    "AnchorGenerator": AnchorGenerator,
    "SSDAnchorGenerator": SSDAnchorGenerator,
    "LegacyAnchorGenerator": LegacyAnchorGenerator,
    "LegacySSDAnchorGenerator": LegacySSDAnchorGenerator,
    "YOLOAnchorGenerator": YOLOAnchorGenerator,
    "PointGenerator": PointGenerator,
}


def build_anchor_generator(cfg: dict):
    cfg = dict(cfg)
    gen_type = cfg.pop("type", "AnchorGenerator")
    if gen_type not in ANCHOR_GENERATORS:
        raise KeyError(
            f"unknown anchor generator {gen_type!r}; "
            f"available: {sorted(ANCHOR_GENERATORS)}"
        )
    return ANCHOR_GENERATORS[gen_type](**cfg)


def flat_anchors_for_input(
    generator: AnchorGenerator, img_shape: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """Concatenated anchors + valid flags for a static input resolution.

    featmap sizes are ceil(img/stride) — the conv output sizes of the
    ResNet+FPN tower for pad-divisor inputs (see core.anchors).

    Returns (anchors (N,4), valid (N,) bool, num_level_anchors list).
    """
    h, w = img_shape
    sizes = [
        (math.ceil(h / s[1]), math.ceil(w / s[0])) for s in generator.strides
    ]
    per_level = generator.grid_anchors(sizes)
    flags = generator.valid_flags(sizes, (h, w))
    counts = [a.shape[0] for a in per_level]
    return (
        np.concatenate(per_level, 0),
        np.concatenate(flags, 0),
        counts,
    )
