"""Synthetic BOP-format dataset fixtures for end-to-end tests.

Fabricates the BOP directory layout (SURVEY.md §3.3 — scene dirs with
rgb/ + mask_visib/ + scene_gt.json + scene_gt_info.json) and/or the
COCO-style detector_annotations json the pipeline consumes, with simple
colored rectangles as 'objects' so detection is learnable and mask paths are
exact.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import List, Tuple

import cv2
import numpy as np


def make_synthetic_bop(
    root: str,
    num_scenes: int = 1,
    images_per_scene: int = 4,
    img_hw: Tuple[int, int] = (480, 640),
    num_classes: int = 3,
    max_objects: int = 4,
    seed: int = 0,
    split: str = "train_pbr",
    mixed_orientation: bool = False,
):
    """Create scenes + a COCO json. Returns (ann_file, img_prefix).

    ``mixed_orientation`` transposes every other image's resolution — an
    aspect-mixed dataset for the per-orientation-view eval path."""
    rng = np.random.RandomState(seed)
    split_dir = osp.join(root, split)
    images, annotations, categories = [], [], []
    for c in range(num_classes):
        categories.append(dict(id=c + 1, name=f"obj_{c + 1:06d}"))

    ann_id = 1
    img_id = 1
    for scene in range(num_scenes):
        scene_dir = osp.join(split_dir, f"{scene:06d}")
        os.makedirs(osp.join(scene_dir, "rgb"), exist_ok=True)
        os.makedirs(osp.join(scene_dir, "mask_visib"), exist_ok=True)
        for i in range(images_per_scene):
            h, w = img_hw
            if mixed_orientation and i % 2 == 1:
                h, w = w, h
            img = rng.randint(0, 80, (h, w, 3), np.uint8)
            n_obj = rng.randint(1, max_objects + 1)
            anns_this = []
            lo = max(16, min(h, w) // 8)
            hi = max(lo + 8, min(h, w) // 3)
            for a in range(n_obj):
                bw = rng.randint(lo, hi)
                bh = rng.randint(lo, hi)
                x1 = rng.randint(0, w - bw)
                y1 = rng.randint(0, h - bh)
                cls = rng.randint(0, num_classes)
                color = [int(60 + 60 * cls) % 256, int(200 - 50 * cls) % 256, 255]
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                mask = np.zeros((h, w), np.uint8)
                mask[y1 : y1 + bh, x1 : x1 + bw] = 255
                cv2.imwrite(
                    osp.join(scene_dir, "mask_visib", f"{i:06d}_{a:06d}.png"), mask
                )
                anns_this.append(
                    dict(
                        id=ann_id,
                        image_id=img_id,
                        category_id=cls + 1,
                        bbox=[float(x1), float(y1), float(bw), float(bh)],
                        area=float(bw * bh),
                        iscrowd=0,
                        visib_fract=1.0,
                    )
                )
                ann_id += 1
            cv2.imwrite(osp.join(scene_dir, "rgb", f"{i:06d}.jpg"), img)
            images.append(
                dict(
                    id=img_id,
                    width=w,
                    height=h,
                    filename=f"{scene:06d}/rgb/{i:06d}.jpg",
                    file_name=f"{scene:06d}/rgb/{i:06d}.jpg",
                )
            )
            annotations.extend(anns_this)
            img_id += 1

    ann_dir = osp.join(root, "detector_annotations")
    os.makedirs(ann_dir, exist_ok=True)
    ann_file = osp.join(ann_dir, f"{split}.json")
    with open(ann_file, "w") as f:
        json.dump(
            dict(images=images, annotations=annotations, categories=categories), f
        )
    return ann_file, split_dir + "/"


def make_raw_bop_scenes(
    root: str,
    num_scenes: int = 1,
    images_per_scene: int = 2,
    img_hw: Tuple[int, int] = (480, 640),
    num_objects: int = 2,
    seed: int = 0,
    split: str = "train_pbr",
) -> str:
    """Create raw BOP scene dirs with scene_gt.json/scene_gt_info.json (no
    COCO json) for exercising tools/bop_to_coco.py. Returns split dir."""
    rng = np.random.RandomState(seed)
    h, w = img_hw
    split_dir = osp.join(root, split)
    for scene in range(num_scenes):
        scene_dir = osp.join(split_dir, f"{scene:06d}")
        os.makedirs(osp.join(scene_dir, "rgb"), exist_ok=True)
        os.makedirs(osp.join(scene_dir, "mask_visib"), exist_ok=True)
        scene_gt = {}
        scene_gt_info = {}
        for i in range(images_per_scene):
            img = rng.randint(0, 80, (h, w, 3), np.uint8)
            gts, infos = [], []
            for a in range(num_objects):
                bw, bh = int(rng.randint(40, 120)), int(rng.randint(40, 120))
                x1, y1 = int(rng.randint(0, w - bw)), int(rng.randint(0, h - bh))
                obj_id = int(rng.randint(1, 4))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), (0, 255, 0), -1)
                mask = np.zeros((h, w), np.uint8)
                mask[y1 : y1 + bh, x1 : x1 + bw] = 255
                cv2.imwrite(
                    osp.join(scene_dir, "mask_visib", f"{i:06d}_{a:06d}.png"), mask
                )
                gts.append(dict(obj_id=obj_id, cam_R_m2c=[1, 0, 0, 0, 1, 0, 0, 0, 1], cam_t_m2c=[0, 0, 500]))
                infos.append(
                    dict(
                        bbox_obj=[x1, y1, bw, bh],
                        bbox_visib=[x1, y1, bw, bh],
                        px_count_all=bw * bh,
                        px_count_visib=bw * bh,
                        visib_fract=1.0,
                    )
                )
            cv2.imwrite(osp.join(scene_dir, "rgb", f"{i:06d}.jpg"), img)
            scene_gt[str(i)] = gts
            scene_gt_info[str(i)] = infos
        with open(osp.join(scene_dir, "scene_gt.json"), "w") as f:
            json.dump(scene_gt, f)
        with open(osp.join(scene_dir, "scene_gt_info.json"), "w") as f:
            json.dump(scene_gt_info, f)
    return split_dir
