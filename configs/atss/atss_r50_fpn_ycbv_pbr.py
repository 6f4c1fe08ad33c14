# ATSS detector on YCB-V PBR — the generic anchor-based head path.
#
# A reference user can pair the registered SingleStageDetector with the
# registered ATSSHead (/root/reference/radet/models/detectors/
# single_stage.py:9, dense_heads/atss_head.py:15) and train it; this config
# is that pairing with the canonical ATSS hyperparameters (octave scale 8,
# 1 anchor/cell, DeltaXYWH coder stds 0.1/0.2, ATSSAssigner topk 9).
_base_ = ["../base/datasets/bop_detection.py", "../base/default_runtime.py"]

CLASS_NAMES = (
    "master_chef_can", "cracker_box", "sugar_box", "tomato_soup_can",
    "mustard_bottle", "tuna_fish_can", "pudding_box", "gelatin_box",
    "potted_meat_can", "banana", "pitcher_base", "bleach_cleanser", "bowl",
    "mug", "power_drill", "wood_block", "scissors", "large_marker",
    "large_clamp", "extra_large_clamp", "foam_brick",
)

model = dict(
    type="SingleStageDetector",
    pretrained=None,
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
    ),
    neck=dict(
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_input",
        num_outs=5,
    ),
    bbox_head=dict(
        type="ATSSHead",
        num_classes=21,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        quality="centerness",
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(
            type="DeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2],
        ),
        loss_cls=dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0,
        ),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        loss_centerness=dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=1.0
        ),
    ),
)

train_cfg = dict(
    assigner=dict(type="ATSSAssigner", topk=9),
    allowed_border=-1,
    pos_weight=-1,
    debug=False,
)
test_cfg = dict(
    nms_pre=1000,
    min_bbox_size=0,
    score_thr=0.05,
    nms=dict(type="nms", iou_threshold=0.6),
    max_per_img=100,
)

# plain detection pipeline: no distance maps / in-pipeline assignment —
# ATSS assigns on IoU inside the jitted train step
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Pad", size_divisor=16),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]

data_root = "data/ycbv/"
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=8,
    train=dict(
        ann_file=data_root + "detector_annotations/train_pbr.json",
        img_prefix=data_root + "train_pbr/",
        classes=CLASS_NAMES,
        min_visib_frac=0.1,
        pipeline=train_pipeline,
    ),
    val=dict(
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        classes=CLASS_NAMES,
        pipeline=test_pipeline,
    ),
    test=dict(
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        classes=CLASS_NAMES,
        bop_submission=True,
        pipeline=test_pipeline,
    ),
)

input_size = (480, 640)
work_dir = "work_dirs/ycbv_atss_r50"
