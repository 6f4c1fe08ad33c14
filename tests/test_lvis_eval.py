"""LVIS federated-protocol tests (evaluation/lvis_eval.py vs the semantics
of the lvis package's LVISEval, reference datasets/lvis.py:230-470)."""

import numpy as np
import pytest

from radet_tpu.data.coco_io import CocoIndex
from radet_tpu.evaluation import COCOEvaluator, LVISEvaluator


def _scene():
    """3 images, 2 categories.

    - img 1: cat 1 positive (one gt), cat 2 verified negative
    - img 2: cat 1 positive (one gt) and NOT exhaustively annotated
    - img 3: cat 1 unknown (neither positive nor negative), cat 2 positive
    """
    return dict(
        images=[
            dict(id=1, filename="a.jpg", width=100, height=100,
                 neg_category_ids=[2], not_exhaustive_category_ids=[]),
            dict(id=2, filename="b.jpg", width=100, height=100,
                 neg_category_ids=[], not_exhaustive_category_ids=[1]),
            dict(id=3, filename="c.jpg", width=100, height=100,
                 neg_category_ids=[], not_exhaustive_category_ids=[]),
        ],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                 area=400.0, iscrowd=0),
            dict(id=2, image_id=2, category_id=1, bbox=[30, 30, 20, 20],
                 area=400.0, iscrowd=0),
            dict(id=3, image_id=3, category_id=2, bbox=[50, 50, 20, 20],
                 area=400.0, iscrowd=0),
        ],
        categories=[
            dict(id=1, name="cat1", frequency="f"),
            dict(id=2, name="cat2", frequency="r"),
        ],
    )


def _det(img, cat, bbox, score):
    return dict(image_id=img, category_id=cat, bbox=list(bbox), score=score)


def _perfect():
    return [
        _det(1, 1, [10, 10, 20, 20], 0.9),
        _det(2, 1, [30, 30, 20, 20], 0.9),
        _det(3, 2, [50, 50, 20, 20], 0.9),
    ]


def _eval(dets, scene=None):
    idx = CocoIndex(scene or _scene())
    ev = LVISEvaluator(idx, cat_ids=[1, 2])
    return ev.evaluate(dets), ev


def test_perfect_detections_ap1():
    m, _ = _eval(_perfect())
    assert m["mAP"] == pytest.approx(1.0)
    assert m["mAP_50"] == pytest.approx(1.0)
    assert m["mAP_f"] == pytest.approx(1.0)
    assert m["mAP_r"] == pytest.approx(1.0)


def test_detection_on_unknown_image_dropped():
    """A cat-1 det on img 3 (cat 1 neither positive nor negative there) must
    be dropped — federated filtering — so AP stays 1.0."""
    dets = _perfect() + [_det(3, 1, [0, 0, 10, 10], 0.95)]
    m, _ = _eval(dets)
    assert m["mAP"] == pytest.approx(1.0)


def test_detection_on_negative_image_is_fp():
    """A cat-2 det on img 1 (cat 2 verified negative) IS a false positive."""
    dets = _perfect() + [_det(1, 2, [0, 0, 10, 10], 0.95)]
    m, _ = _eval(dets)
    assert m["mAP_r"] < 1.0
    # ...and under plain COCO semantics it would also be an FP — sanity
    idx = CocoIndex(_scene())
    coco = COCOEvaluator(idx, cat_ids=[1, 2]).evaluate(dets)
    assert coco["mAP"] < 1.0


def test_unmatched_det_on_not_exhaustive_image_ignored():
    """An unmatched cat-1 det on img 2 (cat 1 not exhaustively annotated) is
    ignored — NOT a false positive — unlike the COCO protocol."""
    dets = _perfect() + [_det(2, 1, [70, 70, 10, 10], 0.95)]
    m, _ = _eval(dets)
    assert m["mAP"] == pytest.approx(1.0)
    idx = CocoIndex(_scene())
    coco = COCOEvaluator(idx, cat_ids=[1, 2]).evaluate(dets)
    assert coco["mAP"] < 1.0  # COCO counts it as FP


def test_matched_det_on_not_exhaustive_image_still_tp():
    """Matched detections on not-exhaustive images still count as TPs (the
    recall denominator includes their gts)."""
    dets = [d for d in _perfect() if d["image_id"] != 2]
    m, _ = _eval(dets)  # missing the img-2 gt → recall hit on cat 1
    assert m["mAP"] < 1.0


def test_per_image_cap_across_categories():
    cap_scene = _scene()
    dets = _perfect()
    # flood img 1 with 400 low-scoring cat-1 dets; cap 300 keeps the best
    for j in range(400):
        dets.append(_det(1, 1, [j % 50, 40, 5, 5], 0.01 + 1e-6 * j))
    idx = CocoIndex(cap_scene)
    ev = LVISEvaluator(idx, cat_ids=[1, 2], max_dets=300)
    # the high-scoring perfect det survives the cap → recall stays 1.0
    m = ev.evaluate(dets)
    assert m["AR@300"] == pytest.approx(1.0)


def test_frequency_buckets_absent_without_frequency_fields():
    scene = _scene()
    for c in scene["categories"]:
        del c["frequency"]
    m, _ = _eval(_perfect(), scene)
    assert "mAP_r" not in m and "mAP_f" not in m
    assert m["mAP"] == pytest.approx(1.0)


def test_exhaustive_lvis_equals_coco_protocol():
    """Differential invariant: when every image lists every absent category
    as verified-negative and nothing is not-exhaustive, the federated
    protocol degenerates to plain COCO at the same maxDets — on randomized
    scenes the full summaries must match."""
    rng = np.random.RandomState(42)
    for trial in range(5):
        n_imgs, n_cats = 6, 4
        cat_ids = list(range(1, n_cats + 1))
        images, anns = [], []
        for i in range(1, n_imgs + 1):
            present = set(
                rng.choice(cat_ids, size=rng.randint(1, n_cats + 1), replace=False)
            )
            images.append(
                dict(
                    id=i, filename=f"{i}.jpg", width=200, height=200,
                    neg_category_ids=[c for c in cat_ids if c not in present],
                    not_exhaustive_category_ids=[],
                )
            )
            for c in present:
                for _ in range(rng.randint(1, 3)):
                    x, y = rng.randint(0, 150, 2)
                    w, h = rng.randint(8, 50, 2)
                    anns.append(
                        dict(
                            id=len(anns) + 1, image_id=i, category_id=int(c),
                            bbox=[float(x), float(y), float(w), float(h)],
                            area=float(w * h), iscrowd=0,
                        )
                    )
        scene = dict(
            images=images,
            annotations=anns,
            categories=[dict(id=c, name=f"c{c}") for c in cat_ids],
        )
        dets = []
        for ann in anns:
            if rng.rand() < 0.8:  # jittered true positives
                bx = [v + float(rng.randn() * 3) for v in ann["bbox"]]
                dets.append(
                    _det(ann["image_id"], ann["category_id"], bx, float(rng.rand()))
                )
        for _ in range(10):  # random false positives on random images
            x, y = rng.randint(0, 150, 2)
            w, h = rng.randint(8, 50, 2)
            dets.append(
                _det(
                    int(rng.randint(1, n_imgs + 1)),
                    int(rng.choice(cat_ids)),
                    [float(x), float(y), float(w), float(h)],
                    float(rng.rand()),
                )
            )
        idx = CocoIndex(scene)
        lvis = LVISEvaluator(idx, cat_ids=cat_ids, max_dets=300).evaluate(dets)
        coco = COCOEvaluator(idx, cat_ids=cat_ids, max_dets=(300,)).evaluate(dets)
        for k in ("mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l"):
            assert lvis[k] == pytest.approx(coco[k], abs=1e-12), (trial, k)
        assert lvis["AR@300"] == pytest.approx(coco["AR@300"], abs=1e-12)


def test_lvis_dataset_delegates():
    from radet_tpu.apis.test import evaluate_results
    from radet_tpu.data import LVISV1Dataset

    ds = LVISV1Dataset(_scene(), test_mode=True)
    results = [
        dict(
            img_id=1,
            boxes=np.array([[10.0, 10.0, 30.0, 30.0]], np.float32),
            scores=np.array([0.9], np.float32),
            labels=np.array([0], np.int64),
        ),
        dict(
            img_id=2,
            boxes=np.array([[30.0, 30.0, 50.0, 50.0]], np.float32),
            scores=np.array([0.9], np.float32),
            labels=np.array([0], np.int64),
        ),
        dict(
            img_id=3,
            boxes=np.array([[50.0, 50.0, 70.0, 70.0]], np.float32),
            scores=np.array([0.9], np.float32),
            labels=np.array([1], np.int64),
        ),
    ]
    metrics = evaluate_results(ds, results)
    assert metrics["bbox_mAP"] == pytest.approx(1.0)
    assert metrics["bbox_mAP_f"] == pytest.approx(1.0)
    classwise = ds.evaluate(results, classwise=True)
    assert classwise["bbox_AP_cat1"] == pytest.approx(1.0)
