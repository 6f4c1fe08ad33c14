import numpy as np

from radet_tpu.data import BOPDataset
from radet_tpu.data.dataset_wrappers import (
    ClassBalancedDataset,
    ConcatDataset,
    MixDataset,
    RepeatDataset,
)

from fixtures import make_synthetic_bop

PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]


def _ds(root, split):
    ann, prefix = make_synthetic_bop(
        str(root), num_scenes=1, images_per_scene=3, img_hw=(128, 160), split=split
    )
    return BOPDataset(
        ann, img_prefix=prefix, pipeline=PIPELINE, input_size=(128, 160), test_mode=True
    )


def test_repeat_and_concat(tmp_path):
    a = _ds(tmp_path / "a", "train_pbr")
    b = _ds(tmp_path / "b", "train_real")
    rep = RepeatDataset(a, 3)
    assert len(rep) == 9
    assert np.array_equal(rep[0]["image"], rep[3]["image"])
    cat = ConcatDataset([a, b])
    assert len(cat) == 6
    assert np.array_equal(cat[0]["image"], a[0]["image"])
    assert np.array_equal(cat[3]["image"], b[0]["image"])
    # attribute forwarding
    assert cat.CLASSES == a.CLASSES
    assert cat.cat_ids == a.cat_ids


def test_mix_dataset_ratio(tmp_path):
    a = _ds(tmp_path / "a", "train_pbr")
    b = _ds(tmp_path / "b", "train_real")
    mix = MixDataset([a, b], ratios=[2, 1])
    assert len(mix) == 2 * 3 + 3


def test_class_balanced(tmp_path):
    a = _ds(tmp_path / "a", "train_pbr")
    cb = ClassBalancedDataset(a, oversample_thr=1.0)
    # with thr 1.0 every category is oversampled -> at least original length
    assert len(cb) >= len(a)
    _ = cb[0]


def test_mix_config_builds(tmp_path):
    from radet_tpu.utils import Config
    from radet_tpu.apis.common import build_dataset

    root = tmp_path / "data"
    make_synthetic_bop(str(root), num_scenes=1, images_per_scene=3, img_hw=(128, 160), split="train_pbr")
    make_synthetic_bop(str(root), num_scenes=1, images_per_scene=2, img_hw=(128, 160), split="train_real")
    cfg_file = tmp_path / "mix.py"
    cfg_file.write_text(
        f"""
model = dict(type="RADet", backbone=dict(depth=18), bbox_head=dict(num_classes=3))
input_size = (128, 160)
pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(160, 128), keep_ratio=True),
    dict(type="GenerateDistanceMap"),
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]
data = dict(
    train=dict(
        type="MixDataset",
        ratios=[2, 1],
        pipeline=pipeline,
        datasets=[
            dict(ann_file=r"{root}/detector_annotations/train_pbr.json", img_prefix=r"{root}/train_pbr/"),
            dict(ann_file=r"{root}/detector_annotations/train_real.json", img_prefix=r"{root}/train_real/"),
        ],
    ),
)
"""
    )
    cfg = Config.fromfile(str(cfg_file))
    ds = build_dataset(cfg, "train", test_mode=False)
    assert len(ds) == 2 * 3 + 2
    s = ds[0]
    assert s["image"].shape == (128, 160, 3)
    assert "dist_vals" in s
