import numpy as np
import pytest

from radet_tpu.data import BOPDataset, DataLoader

from fixtures import make_synthetic_bop

TRAIN_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_bop_mask=True),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="GenerateDistanceMap"),
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]
TEST_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(640, 480), keep_ratio=True),
    dict(type="Pad", size_divisor=32),
]


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    ann_file, img_prefix = make_synthetic_bop(str(root), num_scenes=1, images_per_scene=4)
    return str(root), ann_file, img_prefix


def test_train_sample_shapes(bop_root):
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file,
        img_prefix=img_prefix,
        pipeline=TRAIN_PIPELINE,
        input_size=(480, 640),
        max_gt=32,
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (480, 640, 3) and s["image"].dtype == np.uint8
    assert s["gt_boxes"].shape == (32, 4)
    assert s["gt_labels"].shape == (32,)
    assert s["gt_valid"].shape == (32,)
    assert s["dist_vals"].shape == (6400, 32)
    g = int(s["gt_valid"].sum())
    assert 1 <= g <= 4
    # dist_vals nonzero only for valid gts, and only where masks are
    assert s["dist_vals"][:, g:].sum() == 0
    assert s["dist_vals"].max() == 1.0
    # boxes within image
    b = s["gt_boxes"][s["gt_valid"]]
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b.max() <= 640


def test_dist_vals_match_masks(bop_root):
    root, ann_file, img_prefix = bop_root
    # no flip for determinism
    pipeline = [t for t in TRAIN_PIPELINE if t["type"] != "RandomFlip"]
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=pipeline, input_size=(480, 640)
    )
    s = ds[1]
    from radet_tpu.core import generate_anchors, anchor_centers

    anchors, _, _, _ = generate_anchors((480, 640))
    centers = anchor_centers(anchors)
    b = s["gt_boxes"][0]
    inside = (
        (centers[:, 0] > b[0])
        & (centers[:, 0] < b[2])
        & (centers[:, 1] > b[1])
        & (centers[:, 1] < b[3])
    )
    # synthetic objects are solid rectangles: every center strictly inside the
    # box must see mask value 1
    strict = (
        (centers[:, 0] > b[0] + 1)
        & (centers[:, 0] < b[2] - 1)
        & (centers[:, 1] > b[1] + 1)
        & (centers[:, 1] < b[3] - 1)
    )
    assert s["dist_vals"][strict, 0].min() == 1.0
    assert s["dist_vals"][~inside, 0].max() == 0.0


def test_test_mode_sample(bop_root):
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file,
        img_prefix=img_prefix,
        pipeline=TEST_PIPELINE,
        input_size=(480, 640),
        test_mode=True,
    )
    s = ds[0]
    assert s["image"].shape == (480, 640, 3)
    np.testing.assert_allclose(s["img_shape"], [480, 640])
    np.testing.assert_allclose(s["scale_factor"], 1.0)
    assert "gt_boxes" not in s


def test_loader_batches(bop_root):
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=TRAIN_PIPELINE, input_size=(480, 640)
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 480, 640, 3)
    assert batches[0]["dist_vals"].shape == (2, 6400, 32)


def test_loader_sharding(bop_root):
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=TEST_PIPELINE, input_size=(480, 640), test_mode=True
    )
    ids = set()
    for shard in range(2):
        loader = DataLoader(
            ds, batch_size=1, shuffle=False, num_workers=1, shard_id=shard, num_shards=2
        )
        for b in loader:
            ids.add(int(b["img_id"][0]))
    assert len(ids) == 4  # both shards together cover the dataset


def test_loader_process_workers_match_thread(bop_root):
    """worker_mode='process' (spawned ProcessPoolExecutor) yields exactly the
    same deterministic test-mode batches as the thread loader."""
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=TEST_PIPELINE,
        input_size=(480, 640), test_mode=True,
    )
    kw = dict(batch_size=2, shuffle=False, drop_last=False)
    thread_batches = list(DataLoader(ds, num_workers=2, **kw))
    proc_batches = list(DataLoader(ds, num_workers=2, worker_mode="process", **kw))
    assert len(thread_batches) == len(proc_batches)
    for tb, pb in zip(thread_batches, proc_batches):
        assert tb.keys() == pb.keys()
        for k in tb:
            np.testing.assert_array_equal(tb[k], pb[k])


def test_loader_process_workers_train_mode(bop_root):
    """Augmenting train pipeline under process workers: batches form, shapes
    static; per-task seeding makes the run reproducible."""
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=TRAIN_PIPELINE, input_size=(480, 640)
    )
    def run():
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=2,
            worker_mode="process", drop_last=True, seed=3,
        )
        return list(loader)
    a = run()
    b = run()
    assert len(a) == len(b) == 2
    assert a[0]["image"].shape == (2, 480, 640, 3)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])


def test_loader_rejects_unknown_worker_mode(bop_root):
    root, ann_file, img_prefix = bop_root
    ds = BOPDataset(
        ann_file, img_prefix=img_prefix, pipeline=TEST_PIPELINE,
        input_size=(480, 640), test_mode=True,
    )
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=1, worker_mode="greenlet")


def test_min_visib_filtering(bop_root, tmp_path):
    import json

    root, ann_file, img_prefix = bop_root
    with open(ann_file) as f:
        data = json.load(f)
    for ann in data["annotations"]:
        ann["visib_fract"] = 0.05
    low_file = tmp_path / "low_visib.json"
    with open(low_file, "w") as f:
        json.dump(data, f)
    ds = BOPDataset(
        str(low_file),
        img_prefix=img_prefix,
        pipeline=TRAIN_PIPELINE,
        input_size=(480, 640),
        min_visib_frac=0.1,
    )
    # all GTs ignored -> empty dataset after filtering
    assert len(ds) == 0


# ---------------------------------------------------------------------------
# SegRescale + RandomCenterCropPad (reference transforms.py:746-776,
# 1401-1730) — the last two registered reference transforms
# ---------------------------------------------------------------------------


def test_seg_rescale():
    from radet_tpu.data.pipeline import SegRescale

    seg = np.arange(40 * 60, dtype=np.uint8).reshape(40, 60) % 5
    out = SegRescale(scale_factor=0.5)({"gt_semantic_seg": seg.copy()})
    assert out["gt_semantic_seg"].shape == (20, 30)
    # nearest-neighbor: only original label values appear
    assert set(np.unique(out["gt_semantic_seg"])) <= set(np.unique(seg))
    # factor 1 and absent key are no-ops
    out2 = SegRescale(scale_factor=1.0)({"gt_semantic_seg": seg.copy()})
    np.testing.assert_array_equal(out2["gt_semantic_seg"], seg)
    assert SegRescale(scale_factor=0.5)({"img": np.zeros((4, 4, 3))}) is not None


def test_random_center_crop_pad_train():
    from radet_tpu.data.pipeline import RandomCenterCropPad

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (240, 320, 3), np.uint8)
    boxes = np.asarray(
        [[40, 50, 120, 140], [200, 100, 280, 200]], np.float32
    )
    labels = np.asarray([1, 2], np.int64)
    t = RandomCenterCropPad(
        crop_size=(192, 256), ratios=(0.8, 1.0, 1.2), border=64,
        mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
        to_rgb=False, test_pad_mode=None,
    )
    import random as pyrandom

    pyrandom.seed(3)
    out = t({"img": img.copy(), "gt_bboxes": boxes.copy(),
             "gt_labels": labels.copy(), "img_shape": (240, 320)})
    assert out is not None
    oh, ow = out["img_shape"]
    assert (oh, ow) in [(int(192 * r), int(256 * r)) for r in (0.8, 1.0, 1.2)]
    assert out["img"].shape[:2] == (oh, ow)
    assert out["img"].dtype == np.uint8
    b = out["gt_bboxes"]
    assert len(b) >= 1 and len(out["gt_labels"]) == len(b)
    assert (b[:, 0::2] >= 0).all() and (b[:, 0::2] <= ow).all()
    assert (b[:, 1::2] >= 0).all() and (b[:, 1::2] <= oh).all()
    # surviving boxes keep their size unless clipped at a border
    assert ((b[:, 2] - b[:, 0]) > 0).all()


def test_random_center_crop_pad_train_pastes_mean_fill():
    from radet_tpu.data.pipeline import RandomCenterCropPad

    img = np.full((100, 100, 3), 200, np.uint8)
    t = RandomCenterCropPad(
        crop_size=(300, 300), ratios=(1.0,), border=16,
        mean=[10, 20, 30], std=[1, 1, 1], to_rgb=False, test_pad_mode=None,
    )
    out = t({"img": img, "gt_bboxes": np.asarray([[10, 10, 90, 90]], np.float32),
             "gt_labels": np.asarray([0]), "img_shape": (100, 100)})
    o = out["img"]
    assert o.shape == (300, 300, 3)
    # corners are pure mean fill (the 100x100 content cannot reach them)
    np.testing.assert_array_equal(o[0, 0], [10, 20, 30])
    assert (o == 200).all(axis=-1).sum() >= 90 * 90  # content pasted


@pytest.mark.parametrize(
    "mode,val,want", [("logical_or", 127, (255, 383)), ("size_divisor", 32, (224, 320))]
)
def test_random_center_crop_pad_test_mode(mode, val, want):
    from radet_tpu.data.pipeline import RandomCenterCropPad

    img = np.full((220, 300, 3), 7, np.uint8)
    t = RandomCenterCropPad(
        crop_size=None, ratios=None, border=None,
        mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False,
        test_mode=True, test_pad_mode=(mode, val),
    )
    out = t({"img": img, "img_shape": (220, 300)})
    assert out["img"].shape[:2] == want
    assert out["pad_shape"] == want
    assert out["img_shape"] == (220, 300)
    assert "border" in out
    # original content centered on the canvas
    th, tw = want
    cy, cx = th // 2, tw // 2
    assert (out["img"][cy, cx] == 7).all()


def test_new_transforms_config_buildable():
    from radet_tpu.data.pipeline import build_pipeline

    p = build_pipeline(
        [
            dict(type="SegRescale", scale_factor=0.5),
            dict(
                type="RandomCenterCropPad", crop_size=(128, 160),
                ratios=(1.0,), border=32, mean=[0, 0, 0], std=[1, 1, 1],
                to_rgb=False, test_pad_mode=None,
            ),
        ]
    )
    assert len(p.transforms) == 2
