"""AutoAugment family + native InstaBoost tests (reference
auto_augment.py:45-890, instaboost.py:7-98 — the last descoped pipeline
rows)."""

import random

import numpy as np
import pytest

from radet_tpu.data.auto_augment import (
    AutoAugment,
    BrightnessTransform,
    ColorTransform,
    ContrastTransform,
    EqualizeTransform,
    Rotate,
    Shear,
    Translate,
    enhance_level_to_value,
    level_to_value,
)
from radet_tpu.data.instaboost import InstaBoost
from radet_tpu.data.pipeline import build_pipeline


def _results(h=60, w=80, boxes=None, with_masks=True, seed=0):
    r = np.random.RandomState(seed)
    if boxes is None:
        boxes = np.array([[10, 10, 30, 40], [50, 20, 70, 50]], np.float32)
    out = dict(
        img=r.randint(0, 256, (h, w, 3), np.uint8),
        img_shape=(h, w),
        ori_shape=(h, w),
        gt_bboxes=boxes.astype(np.float32),
        gt_labels=np.arange(len(boxes), dtype=np.int64),
    )
    if with_masks:
        masks = np.zeros((len(boxes), h, w), np.uint8)
        for i, b in enumerate(boxes.astype(int)):
            masks[i, b[1] : b[3], b[0] : b[2]] = 1
        out["gt_masks"] = masks
    return out


# ---------------------------------------------------------------------------
# level mapping (reference auto_augment.py:13-20)
# ---------------------------------------------------------------------------


def test_level_mappings():
    assert level_to_value(10, 0.3) == pytest.approx(0.3)
    assert level_to_value(5, 30) == pytest.approx(15)
    assert enhance_level_to_value(5) == pytest.approx(1.0)  # identity factor


# ---------------------------------------------------------------------------
# Translate
# ---------------------------------------------------------------------------


def test_translate_exact_shift():
    res = _results()
    img0 = res["img"].copy()
    # level 1 * max_offset 40 / 10 = 4 px right
    t = Translate(level=1, prob=1.0, max_translate_offset=40, random_negative_prob=0.0,
                  img_fill_val=7)
    out = t(res)
    np.testing.assert_array_equal(out["img"][:, 4:], img0[:, :-4])
    assert (out["img"][:, :4] == 7).all()
    np.testing.assert_allclose(out["gt_bboxes"][0], [14, 10, 34, 40])
    # masks shift in lockstep with boxes
    b = out["gt_bboxes"][0].astype(int)
    assert out["gt_masks"][0, b[1] : b[3], b[0] : b[2]].all()
    assert out["gt_masks"][0].sum() == (b[3] - b[1]) * (b[2] - b[0])


def test_translate_drops_offscreen_boxes():
    res = _results(boxes=np.array([[0, 10, 6, 20], [40, 10, 60, 20]], np.float32))
    t = Translate(level=10, prob=1.0, max_translate_offset=10, random_negative_prob=1.0)
    out = t(res)  # 10 px left: first box (w=6) fully exits
    assert len(out["gt_bboxes"]) == 1
    assert out["gt_labels"].tolist() == [1]
    assert out["gt_masks"].shape[0] == 1


def test_translate_prob_zero_noop():
    res = _results()
    img0 = res["img"].copy()
    out = Translate(level=8, prob=0.0)(res)
    np.testing.assert_array_equal(out["img"], img0)


# ---------------------------------------------------------------------------
# Shear
# ---------------------------------------------------------------------------


def test_shear_bbox_corner_hull():
    res = _results(h=100, w=100, boxes=np.array([[20, 20, 40, 60]], np.float32))
    # magnitude = 10/10 * 0.2 = 0.2 horizontal: x' = x + 0.2 y
    s = Shear(level=10, prob=1.0, max_shear_magnitude=0.2, random_negative_prob=0.0)
    out = s(res)
    np.testing.assert_allclose(out["gt_bboxes"][0], [24, 20, 52, 60], atol=1e-5)
    # mask warps consistently: its tight bbox matches the sheared box
    ys, xs = np.nonzero(out["gt_masks"][0])
    assert abs(xs.min() - 24) <= 1 and abs(xs.max() + 1 - 52) <= 1
    assert set(np.unique(out["gt_masks"])) <= {0, 1}


def test_shear_vertical_direction():
    res = _results(h=100, w=100, boxes=np.array([[20, 20, 40, 60]], np.float32))
    s = Shear(level=10, prob=1.0, direction="vertical", max_shear_magnitude=0.1,
              random_negative_prob=0.0)
    out = s(res)
    # y' = y + 0.1 x: corners x in [20,40] -> ymin 20+2, ymax 60+4
    np.testing.assert_allclose(out["gt_bboxes"][0], [20, 22, 40, 64], atol=1e-5)


# ---------------------------------------------------------------------------
# Rotate
# ---------------------------------------------------------------------------


def test_rotate_90_matches_rot90():
    res = _results(h=64, w=64, boxes=np.array([[10, 20, 30, 40]], np.float32))
    img0 = res["img"].copy()
    r = Rotate(level=10, prob=1.0, max_rotate_angle=90, random_negative_prob=0.0)
    out = r(res)
    # positive angle = clockwise (mmcv.imrotate): rot90(k=-1), interior exact
    expect = np.rot90(img0, k=-1)
    np.testing.assert_array_equal(out["img"][2:-2, 2:-2], expect[2:-2, 2:-2])
    # box corners rotate 90 cw about (31.5, 31.5): (10,20)->(43.5-20+... )
    np.testing.assert_allclose(out["gt_bboxes"][0], [23, 10, 43, 30], atol=0.6)


def test_rotate_boxes_stay_in_frame():
    for seed in range(5):
        random.seed(seed)
        res = _results(h=50, w=70)
        out = Rotate(level=7, prob=1.0)(res)
        b = out["gt_bboxes"]
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= 70).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= 50).all()
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()


# ---------------------------------------------------------------------------
# Photometric transforms
# ---------------------------------------------------------------------------


def test_enhance_identity_at_level5():
    res = _results()
    img0 = res["img"].copy()
    for cls in (ColorTransform, BrightnessTransform, ContrastTransform):
        out = cls(level=5, prob=1.0)(dict(res, img=img0.copy()))
        assert np.abs(out["img"].astype(int) - img0.astype(int)).max() <= 1, cls


def test_brightness_zero_is_black():
    res = _results()
    out = BrightnessTransform(level=0, prob=1.0)(res)
    # factor = 0.1: heavily darkened
    assert out["img"].mean() < 0.2 * _results()["img"].mean() + 2


def test_color_zero_is_grayscale():
    res = _results()
    out = ColorTransform(level=0, prob=1.0)(res)
    img = out["img"].astype(np.float32)
    # factor 0.1: channels nearly equal (gray-blended)
    assert np.abs(img[..., 0] - img[..., 1]).mean() < 12


def test_equalize_matches_pil():
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageOps

    res = _results(h=48, w=64, seed=3)
    img0 = res["img"].copy()
    out = EqualizeTransform(prob=1.0)(res)
    expect = np.asarray(ImageOps.equalize(Image.fromarray(img0)))
    np.testing.assert_array_equal(out["img"], expect)


# ---------------------------------------------------------------------------
# AutoAugment dispatcher
# ---------------------------------------------------------------------------


def test_autoaugment_applies_one_policy():
    policies = [
        [dict(type="Translate", level=2, prob=1.0, random_negative_prob=0.0,
              max_translate_offset=10)],
        [dict(type="BrightnessTransform", level=0, prob=1.0)],
    ]
    aug = AutoAugment(policies)
    res = _results()
    img0 = res["img"].copy()
    out = aug(res)
    assert not np.array_equal(out["img"], img0)  # one of the two always fires


def test_autoaugment_validates_policies():
    with pytest.raises(ValueError):
        AutoAugment([])
    with pytest.raises(ValueError):
        AutoAugment([[{"no_type": 1}]])
    with pytest.raises(KeyError):
        AutoAugment([[dict(type="NoSuchTransform")]])


def test_autoaugment_buildable_from_config():
    pipe = build_pipeline(
        [
            dict(type="AutoAugment", policies=[
                [dict(type="Shear", level=3), dict(type="ColorTransform", level=5)],
                [dict(type="Rotate", level=5), dict(type="EqualizeTransform")],
            ]),
            dict(type="ContrastTransform", level=4),
        ]
    )
    out = pipe(_results())
    assert out is not None and out["img"].dtype == np.uint8


# ---------------------------------------------------------------------------
# InstaBoost
# ---------------------------------------------------------------------------


def test_instaboost_noop_paths():
    res = _results()
    img0 = res["img"].copy()
    out = InstaBoost(aug_ratio=0.0)(dict(res, img=img0.copy()))
    np.testing.assert_array_equal(out["img"], img0)
    out = InstaBoost(action_candidate=("skip",), action_prob=(1,), aug_ratio=1.0)(
        dict(res, img=img0.copy())
    )
    np.testing.assert_array_equal(out["img"], img0)


def test_instaboost_validation():
    with pytest.raises(ValueError):
        InstaBoost(hflag=True)
    with pytest.raises(ValueError):
        InstaBoost(action_candidate=("teleport",), action_prob=(1,))
    with pytest.raises(KeyError):
        InstaBoost(aug_ratio=1.0)(dict(img=np.zeros((8, 8, 3), np.uint8)))


def test_instaboost_invariants_over_seeds():
    for seed in range(8):
        random.seed(seed)
        res = _results(h=80, w=100)
        out = InstaBoost(aug_ratio=1.0)(res)
        g = len(out["gt_bboxes"])
        assert len(out["gt_labels"]) == g == len(out["gt_masks"])
        assert out["img"].shape == (80, 100, 3) and out["img"].dtype == np.uint8
        # visible masks stay pairwise disjoint after pasting
        if g > 1:
            assert (out["gt_masks"].sum(0) <= 1).all()
        # boxes are the tight hull of their mask
        for i in range(g):
            ys, xs = np.nonzero(out["gt_masks"][i])
            np.testing.assert_array_equal(
                out["gt_bboxes"][i], [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            )


def test_instaboost_horizontal_mirrors_instance():
    random.seed(0)
    boxes = np.array([[5, 30, 25, 50]], np.float32)  # left side
    res = _results(h=80, w=100, boxes=boxes)
    out = InstaBoost(
        action_candidate=("horizontal",), action_prob=(1,),
        scale=(1.0, 1.0), theta=(0, 0), dx=1e9, dy=1e9, color_prob=0.0, aug_ratio=1.0,
    )(res)
    ys, xs = np.nonzero(out["gt_masks"][0])
    assert xs.mean() > 50  # mirrored to the right half


def test_instaboost_near_identity_jitter():
    random.seed(1)
    res = _results(h=80, w=100)
    boxes0 = res["gt_bboxes"].copy()
    out = InstaBoost(
        action_candidate=("normal",), action_prob=(1,),
        scale=(1.0, 1.0), theta=(0, 0), dx=1e9, dy=1e9, color_prob=0.0, aug_ratio=1.0,
    )(res)
    # zero jitter: instances land exactly where they were
    np.testing.assert_allclose(out["gt_bboxes"], boxes0, atol=1.0)


def test_instaboost_buildable_from_config():
    pipe = build_pipeline([dict(type="InstaBoost", aug_ratio=1.0)])
    out = pipe(_results())
    assert out is not None
