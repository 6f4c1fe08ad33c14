"""Data-prep CLI tools: bop_to_coco / collect_image_list / coco_to_bop, and
the new postprocess options (with_nms=False, min_bbox_size, poly2mask)."""

import json
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_raw_bop_scenes, make_synthetic_bop

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _run(args):
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO, env=env
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_bop_to_coco_and_imagelist(tmp_path):
    split_dir = make_raw_bop_scenes(str(tmp_path), num_scenes=2, images_per_scene=2)
    # collect image list
    list_path = tmp_path / "list.txt"
    _run(["tools/collect_image_list.py", "--images-dir", split_dir, "--save-path", str(list_path)])
    paths = list_path.read_text().split()
    assert len(paths) == 4

    out_json = tmp_path / "train.json"
    _run([
        "tools/bop_to_coco.py", "--images-dir", split_dir,
        "--save-path", str(out_json), "--dataset", "tudl",
    ])
    data = json.loads(out_json.read_text())
    assert len(data["images"]) == 4
    assert len(data["annotations"]) == 8
    assert all("visib_fract" in a for a in data["annotations"])
    assert [c["name"] for c in data["categories"]] == ["dragon", "frog", "can"]
    # deterministic ids
    assert [img["id"] for img in data["images"]] == [1, 2, 3, 4]

    # segmentation mode emits polygons
    out_seg = tmp_path / "train_seg.json"
    _run([
        "tools/bop_to_coco.py", "--images-dir", split_dir,
        "--save-path", str(out_seg), "--dataset", "tudl", "--segmentation",
    ])
    seg = json.loads(out_seg.read_text())
    assert all("segmentation" in a for a in seg["annotations"])
    assert all(len(a["segmentation"]) >= 1 for a in seg["annotations"])

    # without-gt test annotations from the list
    out_test = tmp_path / "test.json"
    _run([
        "tools/bop_to_coco.py", "--images-dir", split_dir,
        "--images-list", str(list_path),
        "--save-path", str(out_test), "--dataset", "tudl", "--without-gt",
    ])
    t = json.loads(out_test.read_text())
    assert len(t["images"]) == 4 and "annotations" not in t


def test_poly2mask_pipeline(tmp_path):
    split_dir = make_raw_bop_scenes(str(tmp_path), num_scenes=1, images_per_scene=1)
    out_seg = tmp_path / "seg.json"
    _run([
        "tools/bop_to_coco.py", "--images-dir", split_dir,
        "--save-path", str(out_seg), "--dataset", "tudl", "--segmentation",
    ])
    # dataset must be able to rasterize polygon masks instead of PNGs
    from radet_tpu.data import BOPDataset

    ds = BOPDataset(
        str(out_seg),
        img_prefix=split_dir + "/",
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True, poly2mask=True),
            dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
            dict(type="GenerateDistanceMap"),
            dict(type="SampleDistanceAtAnchors"),
            dict(type="Pad", size_divisor=16),
        ],
        input_size=(480, 640),
    )
    s = ds[0]
    assert s["dist_vals"].max() == 1.0  # rasterized masks hit anchor centers


def test_coco_to_bop_roundtrip(tmp_path):
    dets = [
        dict(scene_id=3, image_id=7, category_id=2, bbox=[10, 20, 30, 40], score=0.9, time=-1.0),
        dict(scene_id=3, image_id=7, category_id=1, bbox=[50, 60, 20, 20], score=0.4, time=-1.0),
    ]
    det_file = tmp_path / "dets.json"
    det_file.write_text(json.dumps(dets))
    _run(["tools/coco_to_bop.py", str(det_file), "--save-dir", str(tmp_path / "bop"), "--score-thr", "0.5"])
    out = json.loads((tmp_path / "bop" / "000003" / "scene_gt_info.json").read_text())
    assert "7" in out and len(out["7"]) == 1
    assert out["7"][0]["obj_id"] == 2


def test_with_nms_false_and_min_bbox_size():
    import jax.numpy as jnp

    from radet_tpu.core import generate_anchors
    from radet_tpu.models.postprocess import get_bboxes

    anchors, _, _, counts = generate_anchors((128, 160))
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    cls_list = [np.full((1, h, w, 2), -10.0, np.float32) for h, w in sizes]
    reg_list = [np.zeros((1, h, w, 4), np.float32) for h, w in sizes]
    iou_list = [np.zeros((1, h, w, 1), np.float32) for h, w in sizes]
    cls_list[0][0, 5, 6, 1] = 4.0
    iou_list[0][0, 5, 6, 0] = 2.0
    reg_list[0][0, 5, 6] = [2.0, 3.0, 1.0, 2.0]  # 24x40 box
    level_anchors = np.split(anchors, np.cumsum(counts)[:-1])
    args = (
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.ones((1, 4)),
    )
    base_cfg = dict(nms_pre=1000, score_thr=0.05, max_per_img=10,
                    nms=dict(type="vote", iou_threshold=0.65))
    det = get_bboxes(*args, test_cfg=base_cfg, with_nms=False)
    # proposal path: candidate set with combined score, no suppression
    keep = np.asarray(det.valid[0])
    assert keep.sum() == 1
    s = float(np.asarray(det.scores[0])[keep][0])
    want = (1 / (1 + np.exp(-4.0))) * (1 / (1 + np.exp(-2.0)))
    np.testing.assert_allclose(s, want, rtol=1e-4)

    # min_bbox_size filters the 24x40 box when set above 24
    det2 = get_bboxes(*args, test_cfg=dict(base_cfg, min_bbox_size=30))
    assert np.asarray(det2.valid).sum() == 0
    det3 = get_bboxes(*args, test_cfg=dict(base_cfg, min_bbox_size=10))
    assert np.asarray(det3.valid).sum() == 1


@pytest.mark.slow
def test_browse_dataset_with_assignment_overlay(tmp_path):
    """browse_dataset renders pipeline output with distance + sampled-positive
    overlays (the reference label_assignment debug() harness)."""
    root = tmp_path / "bop"
    make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=2, img_hw=(128, 160), num_classes=3
    )
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"""
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="GenerateDistanceMap"),
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]
model = dict(
    type="RADet",
    backbone=dict(depth=18), neck=dict(out_channels=32, start_level=1, num_outs=5),
    bbox_head=dict(num_classes=3, in_channels=32, stacked_convs=1, feat_channels=32,
        anchor_generator=dict(ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type="TBLRBBoxCoder", normalizer=1/8)),
)
label_assignment = dict(neg_threshold=0.2, positive_num=6, balance_sample=True, max_gt=8)
input_size = (128, 160)
data = dict(
    train=dict(
        ann_file=r"{root}/detector_annotations/train_pbr.json",
        img_prefix=r"{root}/train_pbr/",
        pipeline=train_pipeline,
        min_visib_frac=0.0,
    ),
)
"""
    )
    out_dir = tmp_path / "browse"
    out = _run(
        [
            "tools/browse_dataset.py", str(cfg_path),
            "--output-dir", str(out_dir), "--num", "1",
            "--show-dist", "--show-assignment",
        ]
    )
    import glob

    rendered = glob.glob(str(out_dir / "*.jpg"))
    assert len(rendered) == 1, out
