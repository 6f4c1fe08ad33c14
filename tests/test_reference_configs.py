"""Reference-config compatibility (VERDICT r2 item 4): the verbatim pipeline
sections of /root/reference/configs/base/datasets/bop_detection.py:5-52 must
load through build_pipeline unmodified — Normalize / DefaultFormatBundle /
Collect / ImageToTensor absorbed, MultiScaleFlipAug (single scale, flip=False)
unwrapped, in-pipeline LabelAssignment mapped to the on-device assignment's
host-side SampleDistanceAtAnchors feed — and a reference-style config (no
top-level label_assignment section) must train."""

import os.path as osp

import numpy as np
import pytest

from fixtures import make_synthetic_bop


def _reference_train_pipeline(background_dir):
    """Verbatim transcription of bop_detection.py:5-36 (paths substituted)."""
    img_norm_cfg = dict(
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
    )
    return [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
        dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
        dict(type="RandomBackground", background_dir=background_dir, prob=0.3),
        dict(type="CosyPoseAug", p=0.8,
             pipelines=[
                 dict(type="PillowBlur", p=1.0, factor_interval=(1, 3)),
                 dict(type="PillowSharpness", p=0.3, factor_interval=(0.0, 50.0)),
                 dict(type="PillowContrast", p=0.3, factor_interval=(0.2, 50.0)),
                 dict(type="PillowBrightness", p=0.5, factor_interval=(0.1, 6.0)),
                 dict(type="PillowColor", p=0.3, factor_interval=(0.0, 20.0)),
             ]),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="GenerateDistanceMap"),
        dict(type="LabelAssignment",
             anchor_generator_cfg=dict(
                 type="AnchorGenerator",
                 ratios=[1.0],
                 octave_base_scale=8,
                 scales_per_octave=1,
                 strides=[8, 16, 32, 64, 128],
             ),
             neg_threshold=0.2,
             positive_num=10,
             adapt_positive_num=False,
             balance_sample=True),
        dict(type="Normalize", **img_norm_cfg),
        dict(type="Pad", size_divisor=16),
        dict(type="DefaultFormatBundle"),
        dict(type="Collect",
             keys=["img", "gt_bboxes", "gt_labels", "points_to_gt_index",
                   "points_weight"]),
    ]


REFERENCE_TEST_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(
        type="MultiScaleFlipAug",
        img_scale=(640, 480),
        flip=False,
        transforms=[
            dict(type="Resize", keep_ratio=True),
            dict(type="RandomFlip"),
            dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type="Pad", size_divisor=32),
            dict(type="ImageToTensor", keys=["img"]),
            dict(type="Collect", keys=["img"]),
        ]),
]


@pytest.fixture(scope="module")
def bop_640(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_ref")
    ann_file, img_prefix = make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=2, img_hw=(480, 640),
        num_classes=3
    )
    bg_dir = root / "coco_bg"
    bg_dir.mkdir()
    import cv2

    cv2.imwrite(str(bg_dir / "bg0.jpg"),
                np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8))
    return ann_file, img_prefix, str(bg_dir)


@pytest.mark.skipif(
    not osp.isdir("/root/reference/configs/bop"),
    reason="reference checkout not present",
)
def test_reference_config_files_build_verbatim():
    """The reference's own shipped config FILES (all 7 buildable
    r50_*_pbr.py; the mix configs are unbuildable in the reference too,
    SURVEY.md §2.2) load through Config.fromfile and build a detector +
    anchor config unmodified."""
    import glob

    from radet_tpu.apis.common import anchor_cfg_from_model, assignment_cfg_from
    from radet_tpu.models import build_detector
    from radet_tpu.utils import Config

    paths = [
        p
        for p in sorted(glob.glob("/root/reference/configs/bop/r50_*_pbr.py"))
        if "mix" not in p
    ]
    assert len(paths) == 7
    for path in paths:
        cfg = Config.fromfile(path)
        model = build_detector(cfg.model.to_dict())
        anchor_cfg = anchor_cfg_from_model(
            cfg.model.to_dict(), assignment_cfg_from(cfg)
        )
        assert model.num_classes > 0
        if "ycbv" in path:
            # hb's own config pairs 33 CLASS_NAMES with num_classes=16 (a
            # reference quirk), so equality only holds where the reference
            # is self-consistent
            assert model.num_classes == len(cfg.CLASS_NAMES) == 21
        assert anchor_cfg.strides == (8, 16, 32, 64, 128)


def test_verbatim_reference_train_pipeline(bop_640):
    ann_file, img_prefix, bg_dir = bop_640
    from radet_tpu.data.bop import BOPDataset
    from radet_tpu.data.pipeline import SampleDistanceAtAnchors

    ds = BOPDataset(
        ann_file,
        img_prefix=img_prefix,
        pipeline=_reference_train_pipeline(bg_dir),
        test_mode=False,
        input_size=(480, 640),
        img_norm=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
    )
    # LabelAssignment became the dist_vals feed; Normalize/bundle absorbed
    kinds = [type(t).__name__ for t in ds.pipeline.transforms]
    assert "SampleDistanceAtAnchors" in kinds
    assert "PhotoMetricDistortion" not in kinds
    assert not any(k in kinds for k in ("Normalize", "DefaultFormatBundle", "Collect"))

    s = ds[0]
    assert s["image"].shape == (480, 640, 3)
    assert s["image"].dtype == np.uint8  # normalization stays on device
    assert s["dist_vals"].shape[1] == ds.max_gt
    assert s["gt_valid"].any()


def test_verbatim_reference_test_pipeline(bop_640):
    ann_file, img_prefix, _ = bop_640
    from radet_tpu.data.bop import BOPDataset

    ds = BOPDataset(
        ann_file,
        img_prefix=img_prefix,
        pipeline=REFERENCE_TEST_PIPELINE,
        test_mode=True,
        input_size=(480, 640),
    )
    s = ds[0]
    assert s["image"].shape == (480, 640, 3)
    assert s["image"].dtype == np.uint8


def test_multiscale_flip_tta_rejected_with_guidance():
    from radet_tpu.data.pipeline import build_pipeline

    with pytest.raises(ValueError, match="tta"):
        build_pipeline([
            dict(type="MultiScaleFlipAug", img_scale=[(640, 480), (800, 600)],
                 flip=False, transforms=[dict(type="Resize", keep_ratio=True)]),
        ])
    with pytest.raises(ValueError, match="tta"):
        build_pipeline([
            dict(type="MultiScaleFlipAug", img_scale=(640, 480), flip=True,
                 transforms=[dict(type="Resize", keep_ratio=True)]),
        ])


def test_normalize_mismatch_fails_fast():
    from radet_tpu.data.pipeline import build_pipeline

    with pytest.raises(ValueError, match="img_norm_cfg"):
        build_pipeline(
            [dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)],
            img_norm=dict(mean=[123.675, 116.28, 103.53],
                          std=[58.395, 57.12, 57.375]),
        )
    with pytest.raises(ValueError, match="to_rgb"):
        build_pipeline(
            [dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False)]
        )


@pytest.mark.slow
def test_reference_style_config_trains(tmp_path):
    """A config whose assignment params live ONLY in the pipeline's
    LabelAssignment entry (the reference layout) trains a step."""
    root = tmp_path / "bop"
    ann_file, img_prefix = make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=2, img_hw=(128, 160),
        num_classes=3
    )
    cfg_path = tmp_path / "ref_style.py"
    cfg_path.write_text(f"""
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="GenerateDistanceMap"),
    dict(type="LabelAssignment",
         anchor_generator_cfg=dict(type="AnchorGenerator", ratios=[1.0],
                                   octave_base_scale=8, scales_per_octave=1,
                                   strides=[8, 16, 32, 64, 128]),
         neg_threshold=0.2, positive_num=10, adapt_positive_num=False,
         balance_sample=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=16),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                               "points_to_gt_index", "points_weight"]),
]
model = dict(
    type="RADet",
    backbone=dict(depth=18, out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(out_channels=32, start_level=1, num_outs=5),
    bbox_head=dict(num_classes=3, in_channels=32, stacked_convs=1, feat_channels=32),
)
test_cfg = dict(nms_pre=1000, score_thr=0.05, max_per_img=20,
                nms=dict(type="vote", iou_threshold=0.65))
optimizer = dict(type="adamw", lr=1e-3, weight_decay=0.05)
lr_config = dict(policy="onecycle", max_lr=1e-3, total_steps=100, pct_start=0.05)
runner = dict(max_iters=1)
checkpoint_config = dict(interval=1000, max_to_keep=1)
evaluation = dict(interval=0)
grad_clip = dict(max_norm=35.0)
log_config = dict(interval=1)
seed = 0
compute_dtype = "float32"
input_size = (128, 160)
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        ann_file=r"{ann_file}",
        img_prefix=r"{img_prefix}",
        pipeline=train_pipeline,
        min_visib_frac=0.0,
    ),
)
""")
    import jax

    from radet_tpu.apis.common import assignment_cfg_from
    from radet_tpu.apis.train import train_detector
    from radet_tpu.utils import Config

    cfg = Config.fromfile(str(cfg_path))
    la = assignment_cfg_from(cfg)
    assert la is not None and la["positive_num"] == 10

    state = train_detector(cfg, work_dir=str(tmp_path / "work"),
                           eval_during_train=False)
    assert int(state.step) == 1
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(jax.device_get(state.params)))
