"""InstaBoost instance paste-jitter augmentation (native implementation).

The reference's ``InstaBoost`` pipeline transform
(/root/reference/radet/datasets/pipelines/instaboost.py:7-98) is a thin
wrapper that delegates entirely to the external ``instaboostfast`` package
(and raises ImportError without it). This build implements the core
augmentation itself so the capability works standalone: each instance is
re-pasted at a jittered location (random scale / shift / rotation; optional
horizontal mirroring across the image's vertical center line), the vacated
pixels are restored by inpainting, and visible masks + boxes are updated for
the new occlusion pattern (InstaBoost, Fang et al., ICCV 2019,
arXiv:1908.07801).

Differences from ``instaboostfast``, documented deviations:

- no appearance-consistency heatmap guidance: ``hflag=True`` is rejected
  (the heatmap needs the external package's matting model); the default
  configs (and the reference default) use ``hflag=False``;
- operates AFTER ``LoadAnnotations`` on decoded ``(G, H, W)`` instance masks
  (the reference mutates COCO polygon ``ann_info`` before decoding, which
  this build's static-shape path never materializes);
- jitter magnitudes: shift is uniform in ±(box_size / dx) pixels per axis —
  the package's documented "maximum movement = size // dx" convention.
"""

from __future__ import annotations

import random
from typing import Any, Dict, Sequence, Tuple

import cv2
import numpy as np


class InstaBoost:
    def __init__(
        self,
        action_candidate: Sequence[str] = ("normal", "horizontal", "skip"),
        action_prob: Sequence[float] = (1, 0, 0),
        scale: Tuple[float, float] = (0.8, 1.2),
        dx: float = 15,
        dy: float = 15,
        theta: Tuple[float, float] = (-1, 1),
        color_prob: float = 0.5,
        hflag: bool = False,
        aug_ratio: float = 0.5,
    ):
        if hflag:
            raise ValueError(
                "InstaBoost(hflag=True) — appearance-consistency heatmap "
                "guidance — requires the external instaboostfast matting "
                "model and is not supported by this native implementation; "
                "use hflag=False (the reference default)"
            )
        unknown = set(action_candidate) - {"normal", "horizontal", "skip"}
        if unknown:
            raise ValueError(f"unknown InstaBoost actions: {sorted(unknown)}")
        if len(action_candidate) != len(action_prob):
            raise ValueError("action_candidate and action_prob length mismatch")
        if dx <= 0 or dy <= 0:
            raise ValueError("dx/dy must be positive divisors")
        total = float(sum(action_prob))
        if total <= 0:
            raise ValueError("action_prob must sum to a positive value")
        self.actions = tuple(action_candidate)
        self.action_prob = tuple(p / total for p in action_prob)
        self.scale = tuple(scale)
        self.dx = float(dx)
        self.dy = float(dy)
        self.theta = tuple(theta)
        self.color_prob = float(color_prob)
        self.aug_ratio = float(aug_ratio)

    def _sample_action(self) -> str:
        r = random.random()
        acc = 0.0
        for a, p in zip(self.actions, self.action_prob):
            acc += p
            if r <= acc:
                return a
        return self.actions[-1]

    def _jitter_matrix(self, box: np.ndarray, action: str, img_w: int) -> np.ndarray:
        """2x3 affine moving one instance: rotate+scale about its center,
        shift by up to box_size/dx|dy, optionally mirror across the image's
        vertical center line."""
        x1, y1, x2, y2 = box
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        w, h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        s = random.uniform(*self.scale)
        tx = random.uniform(-w / self.dx, w / self.dx)
        ty = random.uniform(-h / self.dy, h / self.dy)
        ang = random.uniform(*self.theta)
        mat = cv2.getRotationMatrix2D((float(cx), float(cy)), -ang, s)
        mat[0, 2] += tx
        mat[1, 2] += ty
        if action == "horizontal":
            # mirror appearance and position across x = (W-1)/2
            flip = np.array([[-1, 0, img_w - 1], [0, 1, 0], [0, 0, 1]], np.float64)
            mat = (flip @ np.vstack([mat, [0, 0, 1]]))[:2]
        return mat

    @staticmethod
    def _color_jitter(patch: np.ndarray) -> np.ndarray:
        """Small HSV jitter applied to a pasted instance's pixels."""
        hsv = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV).astype(np.int16)
        hsv[..., 0] = (hsv[..., 0] + random.randint(-6, 6)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] * random.uniform(0.9, 1.1), 0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] * random.uniform(0.9, 1.1), 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)

    def __call__(self, results: Dict[str, Any]) -> Dict[str, Any]:
        if "gt_masks" not in results:
            raise KeyError(
                "InstaBoost needs per-instance masks: place it after "
                "LoadAnnotations(with_bop_mask=True) / LoadMaskFromFile "
                "(this build pastes decoded masks, not ann_info polygons)"
            )
        if random.random() > self.aug_ratio:
            return results
        masks = results["gt_masks"]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        g = len(masks)
        if g == 0:
            return results
        img = results["img"]
        h, w = img.shape[:2]

        actions = [self._sample_action() for _ in range(g)]
        moved = [i for i in range(g) if actions[i] != "skip"]
        if not moved:
            return results

        # restore the background under every moved instance in one inpaint
        hole = np.zeros((h, w), np.uint8)
        for i in moved:
            hole |= masks[i].astype(np.uint8)
        hole = cv2.dilate(hole, np.ones((3, 3), np.uint8))
        canvas = cv2.inpaint(img, hole, 3, cv2.INPAINT_TELEA)
        # pixels of unmoved instances must survive the inpaint exactly
        for i in range(g):
            if i not in moved:
                m = masks[i].astype(bool)
                canvas[m] = img[m]

        new_masks = masks.copy()
        # paste larger instances first so smaller ones stay visible on top,
        # mirroring natural occlusion ordering
        order = sorted(moved, key=lambda i: -float(masks[i].sum()))
        for i in order:
            mat = self._jitter_matrix(boxes[i], actions[i], w)
            warped_mask = cv2.warpAffine(
                masks[i].astype(np.uint8), mat, (w, h),
                flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
            if not warped_mask.any():
                # jitter pushed the instance out of frame: keep it in place
                m = masks[i].astype(bool)
                canvas[m] = img[m]
                continue
            patch = cv2.warpAffine(
                img, mat, (w, h),
                flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
            if random.random() < self.color_prob:
                patch = self._color_jitter(patch)
            sel = warped_mask.astype(bool)
            canvas[sel] = patch[sel]
            # the paste occludes whatever was under it
            new_masks[:, sel] = 0
            new_masks[i] = warped_mask.astype(new_masks.dtype)

        # recompute visible boxes; drop fully-occluded instances
        keep, out_boxes = [], []
        for i in range(g):
            ys, xs = np.nonzero(new_masks[i])
            if len(xs) == 0:
                continue
            keep.append(i)
            out_boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        results["img"] = canvas
        results["gt_masks"] = np.ascontiguousarray(new_masks[keep])
        results["gt_bboxes"] = np.asarray(out_boxes, np.float32).reshape(-1, 4)
        if "gt_labels" in results:
            results["gt_labels"] = results["gt_labels"][keep]
        return results

    def __repr__(self):
        return (
            f"InstaBoost(actions={self.actions}, prob={self.action_prob}, "
            f"scale={self.scale}, dx={self.dx}, dy={self.dy}, theta={self.theta}, "
            f"color_prob={self.color_prob}, aug_ratio={self.aug_ratio})"
        )
