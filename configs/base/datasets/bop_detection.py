# BOP detection data pipeline — capability parity with
# /root/reference/configs/base/datasets/bop_detection.py, restructured for the
# TPU-native input path: the host pipeline emits uint8 RGB images padded to a
# static size plus per-GT distance values sampled at anchor centers; label
# assignment itself runs on-device inside the jitted train step.
dataset_type = "BOPDataset"
data_root = "data/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="RandomBackground", background_dir="data/coco", prob=0.3),
    dict(
        type="CosyPoseAug",
        p=0.8,
        pipelines=[
            dict(type="PillowBlur", p=1.0, factor_interval=(1, 3)),
            dict(type="PillowSharpness", p=0.3, factor_interval=(0.0, 50.0)),
            dict(type="PillowContrast", p=0.3, factor_interval=(0.2, 50.0)),
            dict(type="PillowBrightness", p=0.5, factor_interval=(0.1, 6.0)),
            dict(type="PillowColor", p=0.3, factor_interval=(0.0, 20.0)),
        ],
    ),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="GenerateDistanceMap"),
    # SampleDistanceAtAnchors replaces the reference's in-pipeline
    # LabelAssignment: it gathers distance-map values at anchor centers; the
    # probabilistic assignment happens on-device (core/assignment.py).
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]

# on-device label assignment parameters
# (/root/reference/configs/base/datasets/bop_detection.py:20-32)
label_assignment = dict(
    neg_threshold=0.2,
    positive_num=10,
    balance_sample=True,
    max_gt=32,
)

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "detector_annotations/train_pbr.json",
        img_prefix=data_root + "train_pbr/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "detector_annotations/test_bop19.json",
        img_prefix=data_root + "test/",
        pipeline=test_pipeline,
        bop_submission=True,
    ),
)
