# YCB-V PBR training config — parity with
# /root/reference/configs/bop/r50_ycbv_pbr.py (which, despite its name,
# points at train_real.json; we name things honestly and default to PBR —
# see SURVEY.md §7 'known reference quirks').
_base_ = ["../base/datasets/bop_detection.py", "../base/default_runtime.py"]

CLASS_NAMES = (
    "master_chef_can", "cracker_box", "sugar_box", "tomato_soup_can",
    "mustard_bottle", "tuna_fish_can", "pudding_box", "gelatin_box",
    "potted_meat_can", "banana", "pitcher_base", "bleach_cleanser", "bowl",
    "mug", "power_drill", "wood_block", "scissors", "large_marker",
    "large_clamp", "extra_large_clamp", "foam_brick",
)

model = dict(
    type="RADet",
    pretrained=None,  # set to a converted torchvision/mmcv checkpoint path
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
        add_extra_convs="on_output",
        num_outs=5,
    ),
    bbox_head=dict(
        type="RADetHead",
        num_classes=21,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        strides=[8, 16, 32, 64, 128],
        anchor_generator=dict(
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(type="TBLRBBoxCoder", normalizer=1 / 8),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True, loss_weight=1.0),
    ),
)

test_cfg = dict(
    nms_pre=1000,
    min_bbox_size=0,
    score_thr=0.05,
    # candidates entering vote-NMS, ranked by cluster score; raise to 1024+
    # (or candidate_mode='per_level') for strict reference candidate caps
    nms_topk=512,
    nms=dict(
        type="vote",
        iou_threshold=0.65,
        cluster_score=["cls", "iou"],
        vote_score=["iou", "cls"],
        iou_enable=False,
        sigma=0.025,
    ),
    max_per_img=100,
)

data_root = "data/ycbv/"
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=8,
    train=dict(
        ann_file=data_root + "detector_annotations/train_pbr.json",
        img_prefix=data_root + "train_pbr/",
        classes=CLASS_NAMES,
        min_visib_frac=0.1,
    ),
    val=dict(
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        classes=CLASS_NAMES,
    ),
    test=dict(
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        classes=CLASS_NAMES,
        bop_submission=True,
    ),
)

# static padded input resolution (train pad 16, test pad 32 — both 480x640)
input_size = (480, 640)
work_dir = "work_dirs/ycbv_r50_radet_pbr"
