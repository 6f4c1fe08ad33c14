"""Packed instance-id mask maps (tools/pack_masks.py): lossless vs the
per-instance BOP mask_visib PNGs, and actually preferred by LoadAnnotations."""

import importlib.util
import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from radet_tpu.data import BOPDataset
from radet_tpu.data import pipeline as pl

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "pack_masks", osp.join(REPO, "tools", "pack_masks.py")
)
pack_masks = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pack_masks)


def _write_scene(root, rects_per_image, img_hw=(64, 80)):
    """Handcrafted BOP split with DISJOINT rect masks (true visib semantics)
    + detector_annotations json. rects_per_image: list (per image) of lists
    of (x1, y1, w, h, cls)."""
    h, w = img_hw
    split_dir = osp.join(root, "train_pbr")
    scene_dir = osp.join(split_dir, "000000")
    os.makedirs(osp.join(scene_dir, "rgb"), exist_ok=True)
    os.makedirs(osp.join(scene_dir, "mask_visib"), exist_ok=True)
    images, annotations, categories = [], [], []
    categories = [dict(id=c + 1, name=f"obj_{c + 1:06d}") for c in range(3)]
    ann_id = 1
    for i, rects in enumerate(rects_per_image):
        img = np.full((h, w, 3), 40, np.uint8)
        for a, (x1, y1, bw, bh, cls) in enumerate(rects):
            img[y1:y1 + bh, x1:x1 + bw] = (60 + 60 * cls) % 256
            mask = np.zeros((h, w), np.uint8)
            mask[y1:y1 + bh, x1:x1 + bw] = 255
            cv2.imwrite(osp.join(scene_dir, "mask_visib", f"{i:06d}_{a:06d}.png"), mask)
            annotations.append(
                dict(id=ann_id, image_id=i + 1, category_id=cls + 1,
                     bbox=[float(x1), float(y1), float(bw), float(bh)],
                     area=float(bw * bh), iscrowd=0, visib_fract=1.0)
            )
            ann_id += 1
        cv2.imwrite(osp.join(scene_dir, "rgb", f"{i:06d}.jpg"), img)
        images.append(dict(id=i + 1, width=w, height=h,
                           filename=f"000000/rgb/{i:06d}.jpg",
                           file_name=f"000000/rgb/{i:06d}.jpg"))
    ann_dir = osp.join(root, "detector_annotations")
    os.makedirs(ann_dir, exist_ok=True)
    ann_file = osp.join(ann_dir, "train_pbr.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    return ann_file, split_dir + "/"


RECTS = [
    [(4, 4, 16, 12, 0), (30, 20, 20, 24, 1)],
    [(10, 40, 24, 16, 2), (50, 4, 12, 12, 0), (2, 2, 6, 6, 1)],
]


def _load_masks(ann_file, img_prefix):
    ds = BOPDataset(ann_file, img_prefix=img_prefix, pipeline=None,
                    input_size=(64, 80), max_gt=8)
    load_img = pl.LoadImageFromFile()
    load_ann = pl.LoadAnnotations(with_bbox=True, with_bop_mask=True,
                                  poly2mask=False)
    out = []
    for i in range(len(ds)):
        res = load_ann(load_img(ds._base_results(i)))
        out.append(res["gt_masks"])
    return out


def test_packed_masks_equal_per_instance(tmp_path, monkeypatch):
    ann_file, img_prefix = _write_scene(str(tmp_path), RECTS)
    before = _load_masks(ann_file, img_prefix)

    overlap = pack_masks.pack_split(osp.join(str(tmp_path), "train_pbr"),
                                    verbose=False)
    assert overlap == 0
    assert osp.exists(osp.join(img_prefix, "000000/mask_packed/000001.png"))

    # count decodes: packed path must do exactly ONE imread for the masks
    calls = []
    real_imread = cv2.imread
    monkeypatch.setattr(pl.cv2, "imread",
                        lambda p, f=cv2.IMREAD_COLOR: calls.append(p) or real_imread(p, f))
    after = _load_masks(ann_file, img_prefix)
    mask_reads = [p for p in calls if "mask_visib" in p or "mask_packed" in p]
    assert all("mask_packed" in p for p in mask_reads), mask_reads
    assert len(mask_reads) == len(RECTS)  # one per image, not one per instance

    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_pack_split_detects_overlap(tmp_path):
    overlapping = [[(4, 4, 16, 12, 0), (10, 8, 16, 12, 1)]]
    _write_scene(str(tmp_path), overlapping)
    overlap = pack_masks.pack_split(osp.join(str(tmp_path), "train_pbr"),
                                    verbose=False)
    assert overlap > 0
    assert pack_masks.main([osp.join(str(tmp_path), "train_pbr")]) == 1


def test_pack_image_uint16_for_many_instances(tmp_path):
    # ann indices past 254 force a uint16 id map; roundtrip must preserve ids
    p = osp.join(str(tmp_path), "m.png")
    m = np.zeros((8, 8), np.uint8)
    m[2:4, 2:4] = 255
    cv2.imwrite(p, m)
    out = osp.join(str(tmp_path), "packed", "000000.png")
    overlap = pack_masks.pack_image({300: p}, out)
    assert overlap == 0
    packed = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert packed.dtype == np.uint16
    assert packed.max() == 301
    np.testing.assert_array_equal(packed > 0, m > 0)


def test_missing_packed_file_falls_back(tmp_path):
    ann_file, img_prefix = _write_scene(str(tmp_path), RECTS)
    # no pack_split run: per-instance files must still be used
    masks = _load_masks(ann_file, img_prefix)
    assert len(masks) == len(RECTS)
    for m, rects in zip(masks, RECTS):
        assert m.shape[0] == len(rects)
