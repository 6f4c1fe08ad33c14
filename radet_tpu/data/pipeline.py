"""Host-side data pipeline transforms (numpy/cv2/PIL).

Capability parity with the reference pipeline
(/root/reference/radet/datasets/pipelines/{loading,transforms,color_aug}.py)
restructured for the TPU input path:

- images stay uint8 RGB end-to-end (normalization happens on device,
  models/detector.py:preprocess_images) to keep host->device transfers small;
- ``LabelAssignment`` is REPLACED by ``SampleDistanceAtAnchors``: the host
  only gathers distance-map values at anchor centers into an
  (N_anchor, MAX_GT) matrix; the probabilistic assignment runs on device
  (core/assignment.py);
- everything is padded to a static resolution.

Each transform is a callable on a ``results`` dict (keys: img, gt_bboxes,
gt_labels, gt_masks, img_shape, ori_shape, scale_factor, distance_maps, ...),
mirroring the reference's results-dict protocol so pipelines stay
config-driven.
"""

from __future__ import annotations

import glob
import os.path as osp
import random
from typing import Any, Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)  # threads are managed by the loader


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------


def imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class LoadImageFromFile:
    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        path = osp.join(results.get("img_prefix", ""), results["img_info"]["filename"])
        img = imread_rgb(path)
        results["img"] = img
        results["img_shape"] = img.shape[:2]
        results["ori_shape"] = img.shape[:2]
        results["scale_factor"] = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
        return results


class LoadAnnotations:
    """Loads bboxes/labels from ann_info; optionally per-instance masks —
    from BOP visible-mask PNGs (reference loading.py:403-427) or rasterized
    from COCO polygon segmentations when the annotations carry them
    (poly2mask, reference loading.py with_mask path)."""

    def __init__(self, with_bbox: bool = True, with_bop_mask: bool = False, poly2mask: bool = True):
        self.with_bbox = with_bbox
        self.with_bop_mask = with_bop_mask
        self.poly2mask = poly2mask

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        ann = results["ann_info"]
        results["gt_bboxes"] = ann["bboxes"].copy()
        results["gt_labels"] = ann["labels"].copy()
        if self.with_bop_mask:
            h, w = results["img_info"]["height"], results["img_info"]["width"]
            polys = ann.get("segmentations")
            masks = []
            if polys is not None and self.poly2mask:
                for obj_polys in polys:
                    m = np.zeros((h, w), np.uint8)
                    if obj_polys:
                        pts = [
                            np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
                            for p in obj_polys
                            if len(p) >= 6
                        ]
                        if pts:
                            cv2.fillPoly(m, pts, 1)
                    masks.append(m)
            else:
                for mask_path in ann["masks"]:
                    path = osp.join(results.get("seg_prefix", ""), mask_path)
                    m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                    if m is None:
                        raise FileNotFoundError(path)
                    if m.ndim == 3:
                        m = m[..., 0]
                    mx = m.max()
                    m = (m // mx if mx > 0 else m).astype(np.uint8)
                    masks.append(m)
            if masks:
                results["gt_masks"] = np.stack(masks, 0)
            else:
                results["gt_masks"] = np.zeros((0, h, w), np.uint8)
        return results


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def rescale_size(old_wh: Tuple[int, int], scale_wh: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmcv.rescale_size semantics: fit (w, h) into scale keeping ratio."""
    w, h = old_wh
    max_long, max_short = max(scale_wh), min(scale_wh)
    f = min(max_long / max(w, h), max_short / min(w, h))
    return int(w * f + 0.5), int(h * f + 0.5), f


class Resize:
    """keep_ratio resize of image + boxes + masks (transforms.py:25-316)."""

    def __init__(self, img_scale: Tuple[int, int], keep_ratio: bool = True):
        self.img_scale = tuple(img_scale)  # (w, h)
        self.keep_ratio = keep_ratio

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        img = results["img"]
        h0, w0 = img.shape[:2]
        if self.keep_ratio:
            new_w, new_h, _ = rescale_size((w0, h0), self.img_scale)
        else:
            new_w, new_h = self.img_scale
        if (new_w, new_h) != (w0, h0):
            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w0
        h_scale = new_h / h0
        results["img"] = img
        results["img_shape"] = (new_h, new_w)
        results["scale_factor"] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32
        )
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"] * results["scale_factor"][None]
            b[:, 0::2] = b[:, 0::2].clip(0, new_w)
            b[:, 1::2] = b[:, 1::2].clip(0, new_h)
            results["gt_bboxes"] = b
        if "gt_masks" in results and len(results["gt_masks"]):
            results["gt_masks"] = np.stack(
                [
                    cv2.resize(m, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
                    for m in results["gt_masks"]
                ],
                0,
            )
        return results


class RandomFlip:
    def __init__(self, flip_ratio: float = 0.5):
        self.flip_ratio = flip_ratio

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() >= self.flip_ratio:
            return results
        img = results["img"]
        w = img.shape[1]
        results["img"] = np.ascontiguousarray(img[:, ::-1])
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"].copy()
            b[:, 0] = w - results["gt_bboxes"][:, 2]
            b[:, 2] = w - results["gt_bboxes"][:, 0]
            results["gt_bboxes"] = b
        if "gt_masks" in results and len(results["gt_masks"]):
            results["gt_masks"] = np.ascontiguousarray(results["gt_masks"][:, :, ::-1])
        return results


class Pad:
    """Pad image (bottom/right, zeros) to a static size or size divisor."""

    def __init__(self, size: Optional[Tuple[int, int]] = None, size_divisor: Optional[int] = None):
        self.size = size  # (h, w)
        self.size_divisor = size_divisor

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = (h + d - 1) // d * d, (w + d - 1) // d * d
        if (th, tw) != (h, w):
            out = np.zeros((th, tw) + img.shape[2:], img.dtype)
            out[:h, :w] = img
            results["img"] = out
        results["pad_shape"] = (th, tw)
        return results


# ---------------------------------------------------------------------------
# Color / BOP augmentation
# ---------------------------------------------------------------------------


class RandomBackground:
    """Paste a random background image behind the rendered foreground using
    the complement of the union of GT masks (color_aug.py:91-131)."""

    def __init__(self, background_dir: str, prob: float = 0.3):
        self.background_dir = background_dir
        self.prob = prob
        self._files = sorted(
            glob.glob(osp.join(background_dir, "*.jpg"))
            + glob.glob(osp.join(background_dir, "*.png"))
        )
        # fail loudly — a typo'd dir would otherwise silently disable the
        # augmentation for the whole run (reference color_aug.py:98-99)
        if not self._files:
            raise RuntimeError(f"No background images found in {background_dir}")

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.prob:
            return results
        files = self._files
        if "gt_masks" not in results or not len(results["gt_masks"]):
            return results
        bg = imread_rgb(random.choice(files))
        img = results["img"]
        h, w = img.shape[:2]
        if bg.shape[:2] != (h, w):
            bg = cv2.resize(bg, (w, h))
        foreground = results["gt_masks"].any(axis=0)
        out = img.copy()
        out[~foreground] = bg[~foreground]
        results["img"] = out
        return results


class RandomHSV:
    """Random hue/saturation/value scaling (color_aug.py:14-45)."""

    def __init__(self, h_ratio: float, s_ratio: float, v_ratio: float, prob: float = 1.0):
        self.h_ratio = h_ratio
        self.s_ratio = s_ratio
        self.v_ratio = v_ratio
        self.prob = prob

    def __call__(self, results):
        if random.random() > self.prob:
            return results
        img = results["img"]
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        a = random.uniform(-1, 1) * self.h_ratio + 1
        b = random.uniform(-1, 1) * self.s_ratio + 1
        c = random.uniform(-1, 1) * self.v_ratio + 1
        hsv[:, :, 0] *= a
        hsv[:, :, 1] *= b
        hsv[:, :, 2] *= c
        if a >= 1:
            hsv[:, :, 0] = hsv[:, :, 0].clip(None, 179)
        if b >= 1:
            hsv[:, :, 1] = hsv[:, :, 1].clip(None, 255)
        if c >= 1:
            hsv[:, :, 2] = hsv[:, :, 2].clip(None, 255)
        results["img"] = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return results


class RandomNoise:
    """Additive gaussian noise (color_aug.py:49-67)."""

    def __init__(self, noise_ratio: float, prob: float = 1.0):
        self.noise_ratio = noise_ratio
        self.prob = prob

    def __call__(self, results):
        if random.random() > self.prob:
            return results
        img = results["img"].astype(np.float32)
        sigma = random.uniform(0, self.noise_ratio)
        img = img + np.random.normal(0, sigma, img.shape) * 255
        results["img"] = img.clip(0, 255).astype(np.uint8)
        return results


class RandomSmooth:
    """Random box blur (color_aug.py:70-86)."""

    def __init__(self, max_kernel_size: int = 7, prob: float = 1.0):
        self.kernel_sizes = [i * 2 + 1 for i in range(max_kernel_size // 2 + 1)]
        self.prob = prob

    def __call__(self, results):
        if random.random() > self.prob:
            return results
        k = random.choice(self.kernel_sizes)
        results["img"] = cv2.blur(results["img"], (k, k))
        return results


class _PilEnhance:
    def __init__(self, enhance_name: str, p: float, factor_interval):
        self.enhance_name = enhance_name
        self.p = p
        self.factor_interval = tuple(factor_interval)

    def __call__(self, pil_img):
        from PIL import ImageEnhance

        if random.random() <= self.p:
            fn = getattr(ImageEnhance, self.enhance_name)
            pil_img = fn(pil_img).enhance(factor=random.uniform(*self.factor_interval))
        return pil_img


class PillowBlur:
    def __init__(self, p: float = 0.4, factor_interval=(1, 3)):
        self.p = p
        self.factor_interval = tuple(factor_interval)

    def __call__(self, pil_img):
        from PIL import ImageFilter

        # NB the reference applies blur unconditionally (color_aug.py:181-184,
        # its ``p`` is unused); we honour the configured probability.
        if random.random() <= self.p:
            k = random.randint(*self.factor_interval)
            pil_img = pil_img.filter(ImageFilter.GaussianBlur(k))
        return pil_img


def PillowSharpness(p=0.3, factor_interval=(0.0, 50.0)):
    return _PilEnhance("Sharpness", p, factor_interval)


def PillowContrast(p=0.3, factor_interval=(0.2, 50.0)):
    return _PilEnhance("Contrast", p, factor_interval)


def PillowBrightness(p=0.5, factor_interval=(0.1, 6.0)):
    return _PilEnhance("Brightness", p, factor_interval)


def PillowColor(p=0.3, factor_interval=(0.0, 20.0)):
    return _PilEnhance("Color", p, factor_interval)


_PIL_OPS = {
    "PillowBlur": PillowBlur,
    "PillowSharpness": PillowSharpness,
    "PillowContrast": PillowContrast,
    "PillowBrightness": PillowBrightness,
    "PillowColor": PillowColor,
}


class CosyPoseAug:
    """CosyPose-style PIL enhancement chain (color_aug.py:185-213)."""

    def __init__(self, p: float = 0.8, pipelines: Sequence[dict] = ()):
        self.p = p
        self.ops = []
        for op_cfg in pipelines:
            op_cfg = dict(op_cfg)
            op_type = op_cfg.pop("type")
            self.ops.append(_PIL_OPS[op_type](**op_cfg))

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if random.random() > self.p:
            return results
        from PIL import Image

        pil_img = Image.fromarray(results["img"])
        for op in self.ops:
            pil_img = op(pil_img)
        results["img"] = np.asarray(pil_img)
        return results


# ---------------------------------------------------------------------------
# Distance maps / anchor sampling
# ---------------------------------------------------------------------------


class GenerateDistanceMap:
    """With GT masks the binary visible mask IS the distance map
    (loading.py:579-581).  The mask-free MBD/GDT estimation path is provided
    by ops.native (bbox2distance equivalent) when enabled."""

    def __init__(self, with_gt_mask: bool = True, distance_transform: str = "gdt", **kwargs):
        self.with_gt_mask = with_gt_mask
        self.distance_transform = distance_transform
        self.kwargs = kwargs

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if self.with_gt_mask:
            results["distance_maps"] = results["gt_masks"].astype(np.float32)
        else:
            from ..ops.distance_transform import boxes_to_distance_maps

            results["distance_maps"] = boxes_to_distance_maps(
                results["img"],
                results["gt_bboxes"],
                method=self.distance_transform,
                **self.kwargs,
            )
        return results


class SampleDistanceAtAnchors:
    """Gather distance-map values at anchor centers -> (N_anchor, MAX_GT).

    This is the only assignment work left on the host (the reference's
    cal_sample_pro, label_assignment.py:78-86); everything else runs on
    device.  Anchor centers outside the (resized, pre-pad) image get value 0.
    """

    def __init__(self, anchor_centers: np.ndarray, max_gt: int = 32):
        self.cx = anchor_centers[:, 0].astype(np.int64)
        self.cy = anchor_centers[:, 1].astype(np.int64)
        self.max_gt = max_gt

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        n = self.cx.shape[0]
        # float16 halves the host->device transfer (values are in [0, 1]
        # sampling probabilities; fp16 resolution is far below the sampling
        # noise floor); the on-device assignment upcasts to f32
        dist_vals = np.zeros((n, self.max_gt), np.float16)
        dmaps = results.get("distance_maps")
        if dmaps is not None and len(dmaps):
            h, w = results["img_shape"]
            inside = (self.cx < w) & (self.cy < h)
            cx = np.clip(self.cx, 0, w - 1)
            cy = np.clip(self.cy, 0, h - 1)
            g = min(len(dmaps), self.max_gt)
            vals = dmaps[:g, cy, cx]  # (g, N)
            vals = vals * inside[None].astype(np.float32)
            dist_vals[:, :g] = vals.T.astype(np.float16)
        results["dist_vals"] = dist_vals
        return results


# ---------------------------------------------------------------------------
# Pipeline builder
# ---------------------------------------------------------------------------

_TRANSFORMS = {
    "LoadImageFromFile": LoadImageFromFile,
    "LoadAnnotations": LoadAnnotations,
    "Resize": Resize,
    "RandomFlip": RandomFlip,
    "Pad": Pad,
    "RandomBackground": RandomBackground,
    "CosyPoseAug": CosyPoseAug,
    "RandomHSV": RandomHSV,
    "RandomNoise": RandomNoise,
    "RandomSmooth": RandomSmooth,
    "GenerateDistanceMap": GenerateDistanceMap,
    "SampleDistanceAtAnchors": SampleDistanceAtAnchors,
}


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


def build_pipeline(
    pipeline_cfg: Sequence[dict],
    *,
    input_size: Tuple[int, int] | None = None,
    anchor_centers: np.ndarray | None = None,
    max_gt: int = 32,
) -> Compose:
    """Build a Compose from reference-style pipeline config dicts.

    ``Pad`` entries are upgraded to pad to the static ``input_size`` (their
    size_divisor is validated against it); ``SampleDistanceAtAnchors`` gets
    the precomputed anchor centers injected.
    """
    ts = []
    for t_cfg in pipeline_cfg:
        t_cfg = dict(t_cfg)
        t_type = t_cfg.pop("type")
        if t_type == "Pad" and input_size is not None:
            d = t_cfg.pop("size_divisor", None)
            if d is not None:
                assert input_size[0] % d == 0 and input_size[1] % d == 0, (
                    f"static input_size {input_size} not divisible by {d}"
                )
            ts.append(Pad(size=input_size))
            continue
        if t_type == "SampleDistanceAtAnchors":
            assert anchor_centers is not None, "anchor_centers required"
            ts.append(SampleDistanceAtAnchors(anchor_centers, max_gt=max_gt))
            continue
        if t_type not in _TRANSFORMS:
            raise KeyError(f"unknown transform {t_type}")
        ts.append(_TRANSFORMS[t_type](**t_cfg))
    return Compose(ts)
