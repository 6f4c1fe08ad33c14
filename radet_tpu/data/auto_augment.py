"""AutoAugment-for-detection host transforms (numpy/cv2).

Capability parity with the reference's auto_augment pipeline family
(/root/reference/radet/datasets/pipelines/auto_augment.py): ``AutoAugment``
(random-policy dispatcher), the geometric ``Shear``/``Rotate``/``Translate``
(image + bboxes + per-instance masks, constant border fill, degenerate-box
filtering) and the photometric ``ColorTransform``/``EqualizeTransform``/
``BrightnessTransform``/``ContrastTransform`` (image only).

Differences from the reference, by design of this build:

- images are RGB uint8 end-to-end (reference is BGR); the gray-blend
  transforms use RGB luma weights accordingly — same coefficients, so
  outputs match the reference pixel-for-pixel on the same image content;
- masks are plain ``(G, H, W)`` uint8 arrays (no BitmapMasks class) and are
  warped with nearest-neighbour interpolation so they stay binary;
- there is no semantic-segmentation field in this data path (the reference
  threads ``gt_semantic_seg`` through; RADet never loads one).

Level semantics follow the reference exactly: ``level`` in [0, 10] scales
linearly to the transform magnitude (`level_to_value`,
auto_augment.py:13-20), and geometric magnitudes are negated with
probability ``random_negative_prob``.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Sequence, Tuple

import cv2
import numpy as np

_MAX_LEVEL = 10


def level_to_value(level: float, max_value: float) -> float:
    return (level / _MAX_LEVEL) * max_value


def enhance_level_to_value(level: float, a: float = 1.8, b: float = 0.1) -> float:
    return (level / _MAX_LEVEL) * a + b


def _random_negative(value: float, prob: float) -> float:
    return -value if random.random() < prob else value


def _fill3(img_fill_val) -> Tuple[float, float, float]:
    if isinstance(img_fill_val, (int, float)):
        return (float(img_fill_val),) * 3
    vals = tuple(float(v) for v in img_fill_val)
    if len(vals) != 3:
        raise ValueError(f"img_fill_val must be a scalar or 3-tuple, got {img_fill_val}")
    if not all(0 <= v <= 255 for v in vals):
        raise ValueError(f"img_fill_val out of [0,255]: {vals}")
    return vals


def _check_level_prob(level: float, prob: float):
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be in [0,{_MAX_LEVEL}], got {level}")
    if not 0 <= prob <= 1:
        raise ValueError(f"prob must be in [0,1], got {prob}")


def _warp_img(img: np.ndarray, mat: np.ndarray, fill: Tuple[float, float, float],
              interpolation: str) -> np.ndarray:
    interp = {"bilinear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST}[interpolation]
    h, w = img.shape[:2]
    out = cv2.warpAffine(
        img, mat[:2].astype(np.float64), (w, h),
        flags=interp, borderMode=cv2.BORDER_CONSTANT, borderValue=fill,
    )
    return out.astype(img.dtype)


def _warp_masks(masks: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Warp (G, H, W) binary masks with nearest interpolation, fill 0."""
    if len(masks) == 0:
        return masks
    g, h, w = masks.shape
    out = np.empty_like(masks)
    for i in range(g):
        out[i] = cv2.warpAffine(
            masks[i], mat[:2].astype(np.float64), (w, h),
            flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
    return out


def _warp_bboxes(boxes: np.ndarray, mat: np.ndarray, w: int, h: int) -> np.ndarray:
    """Transform each box's 4 corners by the 2x3 affine, retake the
    axis-aligned hull, clip to the image (reference _shear_bboxes /
    _rotate_bboxes corner semantics, auto_augment.py:204-232, 427-459)."""
    if len(boxes) == 0:
        return boxes
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = np.stack(
        [np.stack([x1, y1], -1), np.stack([x2, y1], -1),
         np.stack([x1, y2], -1), np.stack([x2, y2], -1)], axis=1
    )  # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), corners.dtype)
    hom = np.concatenate([corners, ones], -1)  # (N, 4, 3)
    new = hom @ mat[:2].T  # (N, 4, 2)
    min_xy = new.min(axis=1)
    max_xy = new.max(axis=1)
    min_x = np.clip(min_xy[:, 0], 0, w)
    min_y = np.clip(min_xy[:, 1], 0, h)
    max_x = np.clip(max_xy[:, 0], min_x, w)
    max_y = np.clip(max_xy[:, 1], min_y, h)
    return np.stack([min_x, min_y, max_x, max_y], -1).astype(boxes.dtype)


def _filter_degenerate(results: Dict[str, Any], min_size: float = 0):
    """Drop boxes that collapsed below min_size after a geometric warp,
    together with their labels/masks (reference _filter_invalid)."""
    boxes = results.get("gt_bboxes")
    if boxes is None or len(boxes) == 0:
        return
    keep = ((boxes[:, 2] - boxes[:, 0]) > min_size) & ((boxes[:, 3] - boxes[:, 1]) > min_size)
    if keep.all():
        return
    idx = np.nonzero(keep)[0]
    results["gt_bboxes"] = boxes[idx]
    if "gt_labels" in results:
        results["gt_labels"] = results["gt_labels"][idx]
    if "gt_masks" in results and len(results["gt_masks"]):
        results["gt_masks"] = np.ascontiguousarray(results["gt_masks"][idx])


def _apply_affine(results: Dict[str, Any], mat: np.ndarray,
                  fill: Tuple[float, float, float], interpolation: str,
                  min_size: float = 0) -> Dict[str, Any]:
    img = results["img"]
    h, w = img.shape[:2]
    results["img"] = _warp_img(img, mat, fill, interpolation)
    if "gt_bboxes" in results:
        results["gt_bboxes"] = _warp_bboxes(results["gt_bboxes"], mat, w, h)
    if "gt_masks" in results:
        results["gt_masks"] = _warp_masks(results["gt_masks"], mat)
    _filter_degenerate(results, min_size)
    return results


class Shear:
    """Shear image/boxes/masks along one axis by ``level/10 *
    max_shear_magnitude`` (reference auto_augment.py:111-325)."""

    def __init__(self, level, img_fill_val=128, seg_ignore_label=255, prob: float = 0.5,
                 direction: str = "horizontal", max_shear_magnitude: float = 0.3,
                 random_negative_prob: float = 0.5, interpolation: str = "bilinear"):
        _check_level_prob(level, prob)
        if direction not in ("horizontal", "vertical"):
            raise ValueError(f"direction must be horizontal|vertical, got {direction}")
        if not 0.0 <= max_shear_magnitude <= 1.0:
            raise ValueError(f"max_shear_magnitude must be in [0,1], got {max_shear_magnitude}")
        self.magnitude = level_to_value(level, max_shear_magnitude)
        self.fill = _fill3(img_fill_val)
        self.prob = prob
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.interpolation = interpolation

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        m = _random_negative(self.magnitude, self.random_negative_prob)
        if self.direction == "horizontal":
            mat = np.array([[1, m, 0], [0, 1, 0]], np.float32)
        else:
            mat = np.array([[1, 0, 0], [m, 1, 0]], np.float32)
        return _apply_affine(results, mat, self.fill, self.interpolation)


class Rotate:
    """Rotate image/boxes/masks about the image center (or ``center``) by
    ``level/10 * max_rotate_angle`` degrees, optional isotropic ``scale``
    (reference auto_augment.py:328-539)."""

    def __init__(self, level, scale: float = 1, center=None, img_fill_val=128,
                 seg_ignore_label=255, prob: float = 0.5, max_rotate_angle: float = 30,
                 random_negative_prob: float = 0.5):
        _check_level_prob(level, prob)
        if isinstance(center, (int, float)):
            center = (center, center)
        self.angle = level_to_value(level, max_rotate_angle)
        self.scale = scale
        self.center = center
        self.fill = _fill3(img_fill_val)
        self.prob = prob
        self.random_negative_prob = random_negative_prob

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        h, w = results["img"].shape[:2]
        center = self.center if self.center is not None else ((w - 1) * 0.5, (h - 1) * 0.5)
        angle = _random_negative(self.angle, self.random_negative_prob)
        # cv2's y-down frame: negate so positive angles rotate clockwise,
        # matching mmcv.imrotate (reference _rotate_img semantics)
        mat = cv2.getRotationMatrix2D(tuple(center), -angle, self.scale)
        return _apply_affine(results, mat, self.fill, "bilinear")


class Translate:
    """Translate image/boxes/masks by ``int(level/10 * max_translate_offset)``
    pixels along one axis (reference auto_augment.py:542-707)."""

    def __init__(self, level, prob: float = 0.5, img_fill_val=128, seg_ignore_label=255,
                 direction: str = "horizontal", max_translate_offset: float = 250.0,
                 random_negative_prob: float = 0.5, min_size: float = 0):
        _check_level_prob(level, prob)
        if direction not in ("horizontal", "vertical"):
            raise ValueError(f"direction must be horizontal|vertical, got {direction}")
        self.offset = int(level_to_value(level, max_translate_offset))
        self.prob = prob
        self.fill = _fill3(img_fill_val)
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.min_size = min_size

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        off = _random_negative(self.offset, self.random_negative_prob)
        if self.direction == "horizontal":
            mat = np.array([[1, 0, off], [0, 1, 0]], np.float32)
        else:
            mat = np.array([[1, 0, 0], [0, 1, off]], np.float32)
        return _apply_affine(results, mat, self.fill, "bilinear", self.min_size)


def _gray(img: np.ndarray) -> np.ndarray:
    return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)


def _blend(img: np.ndarray, degenerated: np.ndarray, factor: float) -> np.ndarray:
    out = img.astype(np.float32) * factor + degenerated.astype(np.float32) * (1 - factor)
    return np.clip(out, 0, 255).astype(img.dtype)


class ColorTransform:
    """Blend the image with its grayscale version: factor 1 = identity, 0 =
    fully desaturated (mmcv.adjust_color semantics; reference
    auto_augment.py:709-755)."""

    def __init__(self, level, prob: float = 0.5):
        _check_level_prob(level, prob)
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        img = results["img"]
        gray3 = cv2.cvtColor(_gray(img), cv2.COLOR_GRAY2RGB)
        results["img"] = _blend(img, gray3, self.factor)
        return results


class EqualizeTransform:
    """Per-channel histogram equalization, PIL ImageOps.equalize algorithm
    (mmcv.imequalize; reference auto_augment.py:758-793)."""

    def __init__(self, prob: float = 0.5):
        if not 0 <= prob <= 1:
            raise ValueError(f"prob must be in [0,1], got {prob}")
        self.prob = prob

    @staticmethod
    def _equalize_channel(ch: np.ndarray) -> np.ndarray:
        histo = np.histogram(ch, 256, (0, 255))[0]
        nonzero = histo[histo > 0]
        step = (nonzero.sum() - nonzero[-1]) // 255 if len(nonzero) else 0
        if not step:
            return ch
        lut = (np.cumsum(histo) + (step // 2)) // step
        lut = np.concatenate([[0], lut[:-1]], 0)
        return np.clip(lut, 0, 255).astype(ch.dtype)[ch]

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        img = results["img"]
        results["img"] = np.stack(
            [self._equalize_channel(img[..., c]) for c in range(img.shape[-1])], -1
        )
        return results


class BrightnessTransform:
    """Blend with black: factor 1 = identity, 0 = black (mmcv
    adjust_brightness; reference auto_augment.py:796-842)."""

    def __init__(self, level, prob: float = 0.5):
        _check_level_prob(level, prob)
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        results["img"] = _blend(results["img"], np.zeros_like(results["img"]), self.factor)
        return results


class ContrastTransform:
    """Blend with the mean-gray constant image (mmcv adjust_contrast;
    reference auto_augment.py:845-890)."""

    def __init__(self, level, prob: float = 0.5):
        _check_level_prob(level, prob)
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        img = results["img"]
        mean = int(round(float(_gray(img).mean())))
        degenerated = np.full_like(img, mean)
        results["img"] = _blend(img, degenerated, self.factor)
        return results


class AutoAugment:
    """Pick one random policy (a sub-pipeline of transform dicts) per sample
    and apply it (reference auto_augment.py:45-108). Policies may contain any
    registered transform type."""

    def __init__(self, policies: Sequence[Sequence[dict]]):
        if not isinstance(policies, (list, tuple)) or not policies:
            raise ValueError("policies must be a non-empty list of policies")
        from .pipeline import Compose, _TRANSFORMS  # registry lives in pipeline

        self.policies: List[List[dict]] = [list(p) for p in policies]
        built = []
        for policy in self.policies:
            if not isinstance(policy, (list, tuple)) or not policy:
                raise ValueError("each policy must be a non-empty list of dicts")
            steps = []
            for aug in policy:
                if not isinstance(aug, dict) or "type" not in aug:
                    raise ValueError(f"each augmentation must be a dict with 'type': {aug}")
                cfg = dict(aug)
                t = cfg.pop("type")
                if t not in _TRANSFORMS:
                    raise KeyError(f"unknown transform {t} in AutoAugment policy")
                steps.append(_TRANSFORMS[t](**cfg))
            built.append(Compose(steps))
        self.transforms = built

    def __call__(self, results):
        return self.transforms[random.randrange(len(self.transforms))](results)

    def __repr__(self):
        return f"AutoAugment(policies={self.policies})"


TRANSFORMS = {
    "AutoAugment": AutoAugment,
    "Shear": Shear,
    "Rotate": Rotate,
    "Translate": Translate,
    "ColorTransform": ColorTransform,
    "EqualizeTransform": EqualizeTransform,
    "BrightnessTransform": BrightnessTransform,
    "ContrastTransform": ContrastTransform,
}
