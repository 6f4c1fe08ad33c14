"""Evaluator edge cases and loader robustness."""

import json

import numpy as np

from radet_tpu.data.coco_io import CocoIndex
from radet_tpu.evaluation import COCOEvaluator


def _gt(tmp_path):
    data = dict(
        images=[dict(id=1, width=640, height=480, file_name="a.jpg")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 100, 100], area=10000, iscrowd=0)
        ],
        categories=[dict(id=1, name="c1"), dict(id=2, name="c2")],
    )
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    return CocoIndex(str(p))


def test_no_detections(tmp_path):
    ev = COCOEvaluator(_gt(tmp_path), cat_ids=[1, 2])
    out = ev.evaluate([])
    assert out["mAP"] == 0.0
    assert out["AR@100"] == 0.0


def test_detections_for_absent_category(tmp_path):
    ev = COCOEvaluator(_gt(tmp_path), cat_ids=[1, 2])
    # cat 2 has no GT: its detections must not crash or pollute cat-1 AP
    dets = [
        dict(image_id=1, category_id=1, bbox=[10, 10, 100, 100], score=0.9),
        dict(image_id=1, category_id=2, bbox=[300, 300, 50, 50], score=0.8),
    ]
    out = ev.evaluate(dets)
    np.testing.assert_allclose(out["mAP"], 1.0, atol=1e-6)


def test_duplicate_detections_penalized(tmp_path):
    ev = COCOEvaluator(_gt(tmp_path), cat_ids=[1])
    dets = [
        dict(image_id=1, category_id=1, bbox=[10, 10, 100, 100], score=0.9),
        dict(image_id=1, category_id=1, bbox=[11, 11, 100, 100], score=0.8),  # dup = FP
    ]
    out = ev.evaluate(dets)
    # precision drops after the duplicate: AP@0.5 = 1.0 still (all recall
    # reached before the dup), mAP over IoUs where first matches
    assert out["mAP_50"] == 1.0


def test_unknown_image_id_detections_ignored(tmp_path):
    ev = COCOEvaluator(_gt(tmp_path), cat_ids=[1])
    dets = [
        dict(image_id=1, category_id=1, bbox=[10, 10, 100, 100], score=0.9),
        dict(image_id=999, category_id=1, bbox=[10, 10, 100, 100], score=0.95),
    ]
    out = ev.evaluate(dets)
    # det on an image outside the eval set contributes nothing
    np.testing.assert_allclose(out["mAP"], 1.0, atol=1e-6)


def test_classwise_ap(tmp_path):
    """classwise_ap returns per-class AP keyed by class name (the reference's
    --eval-options classwise=True)."""
    ev = COCOEvaluator(_gt(tmp_path), cat_ids=[1, 2])
    dets = [dict(image_id=1, category_id=1, bbox=[10, 10, 100, 100], score=0.9)]
    ev.evaluate(dets)
    cw = ev.classwise_ap()
    assert set(cw) == {"c1", "c2"}
    np.testing.assert_allclose(cw["c1"], 1.0, atol=1e-6)
    assert cw["c2"] == -1.0  # no GT for c2
