import json

import numpy as np
import pytest

from radet_tpu.data.coco_io import CocoIndex
from radet_tpu.evaluation import COCOEvaluator


def _write_gt(tmp_path, anns, num_imgs=2, num_cats=2):
    data = dict(
        images=[dict(id=i + 1, width=640, height=480, file_name=f"{i}.jpg") for i in range(num_imgs)],
        annotations=anns,
        categories=[dict(id=c + 1, name=f"c{c}") for c in range(num_cats)],
    )
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    return str(p)


def _ann(aid, img, cat, bbox, **kw):
    return dict(
        id=aid,
        image_id=img,
        category_id=cat,
        bbox=bbox,
        area=bbox[2] * bbox[3],
        iscrowd=0,
        **kw,
    )


def _det(img, cat, bbox, score):
    return dict(image_id=img, category_id=cat, bbox=bbox, score=score)


def test_perfect_detections(tmp_path):
    anns = [
        _ann(1, 1, 1, [10, 10, 100, 100]),
        _ann(2, 1, 2, [200, 200, 80, 80]),
        _ann(3, 2, 1, [50, 50, 120, 90]),
    ]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1, 2])
    dets = [
        _det(1, 1, [10, 10, 100, 100], 0.9),
        _det(1, 2, [200, 200, 80, 80], 0.8),
        _det(2, 1, [50, 50, 120, 90], 0.95),
    ]
    out = ev.evaluate(dets)
    np.testing.assert_allclose(out["mAP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["mAP_50"], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-6)


def test_missed_and_false_positive(tmp_path):
    anns = [
        _ann(1, 1, 1, [10, 10, 100, 100]),
        _ann(2, 2, 1, [50, 50, 100, 100]),
    ]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1, 2])
    # one perfect (higher score), one false positive (lower score), one miss
    dets = [
        _det(1, 1, [10, 10, 100, 100], 0.9),
        _det(1, 1, [400, 400, 50, 50], 0.3),
    ]
    out = ev.evaluate(dets)
    # recall 0.5; precision at recall<=0.5 is 1.0 -> AP = 51/101
    np.testing.assert_allclose(out["mAP"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(out["AR@100"], 0.5, atol=1e-6)


def test_localization_quality_affects_high_ious(tmp_path):
    anns = [_ann(1, 1, 1, [0, 0, 100, 100])]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1, 2])
    # IoU ~ 100*100 overlap shifted by 20px: inter 80*100=8000... use shift 10
    # box shifted 10px: inter=90*100=9000, union=2*10000-9000=11000, iou=0.818
    dets = [_det(1, 1, [10, 0, 100, 100], 0.9)]
    out = ev.evaluate(dets)
    # matched for thresholds 0.5..0.8 (7 of 10), unmatched above
    np.testing.assert_allclose(out["mAP"], 7 / 10, atol=1e-2)
    np.testing.assert_allclose(out["mAP_50"], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["mAP_75"], 1.0, atol=1e-6)


def test_score_ordering_matters(tmp_path):
    anns = [_ann(1, 1, 1, [0, 0, 100, 100])]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1])
    # false positive scored HIGHER than the true positive
    dets = [
        _det(1, 1, [300, 300, 50, 50], 0.95),
        _det(1, 1, [0, 0, 100, 100], 0.5),
    ]
    out = ev.evaluate(dets)
    # precision at the TP is 1/2 -> AP = 0.5
    np.testing.assert_allclose(out["mAP"], 0.5, atol=1e-6)


def test_area_ranges(tmp_path):
    anns = [
        _ann(1, 1, 1, [0, 0, 20, 20]),  # small (400 px)
        _ann(2, 1, 1, [100, 100, 200, 200]),  # large
    ]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1])
    dets = [
        _det(1, 1, [0, 0, 20, 20], 0.9),
        _det(1, 1, [100, 100, 200, 200], 0.8),
    ]
    out = ev.evaluate(dets)
    np.testing.assert_allclose(out["mAP_s"], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["mAP_l"], 1.0, atol=1e-6)
    assert out["mAP_m"] == -1.0  # no medium GT


def test_crowd_gt_ignored(tmp_path):
    anns = [
        _ann(1, 1, 1, [0, 0, 100, 100]),
        dict(id=2, image_id=1, category_id=1, bbox=[300, 300, 100, 100], area=10000, iscrowd=1),
    ]
    gt = CocoIndex(_write_gt(tmp_path, anns))
    ev = COCOEvaluator(gt, cat_ids=[1])
    # detection on the crowd region should be ignored, not counted FP
    dets = [
        _det(1, 1, [0, 0, 100, 100], 0.9),
        _det(1, 1, [300, 300, 100, 100], 0.8),
    ]
    out = ev.evaluate(dets)
    np.testing.assert_allclose(out["mAP"], 1.0, atol=1e-6)


try:
    import pycocotools  # noqa: F401

    HAS_PYCOCO = True
except ImportError:
    HAS_PYCOCO = False


@pytest.mark.skipif(not HAS_PYCOCO, reason="pycocotools unavailable (expected here)")
def test_against_pycocotools(tmp_path, rng):
    # randomized differential test, runs only if pycocotools is installed
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    anns = []
    aid = 1
    for img in (1, 2):
        for _ in range(5):
            x, y = rng.randint(0, 400, 2)
            w, h = rng.randint(20, 150, 2)
            anns.append(_ann(aid, img, int(rng.randint(1, 3)), [float(x), float(y), float(w), float(h)]))
            aid += 1
    gt_file = _write_gt(tmp_path, anns)
    dets = []
    for a in anns:
        if rng.rand() < 0.8:
            bx = [a["bbox"][0] + rng.randn() * 5, a["bbox"][1] + rng.randn() * 5, a["bbox"][2], a["bbox"][3]]
            dets.append(_det(a["image_id"], a["category_id"], [float(v) for v in bx], float(rng.rand())))
    for _ in range(5):
        x, y = rng.randint(0, 400, 2)
        dets.append(_det(int(rng.randint(1, 3)), int(rng.randint(1, 3)), [float(x), float(y), 50.0, 50.0], float(rng.rand())))

    ev = COCOEvaluator(CocoIndex(gt_file), cat_ids=[1, 2])
    ours = ev.evaluate(dets)

    coco = COCO(gt_file)
    cdt = coco.loadRes([dict(d) for d in dets])
    ce = COCOeval(coco, cdt, "bbox")
    ce.evaluate()
    ce.accumulate()
    ce.summarize()
    np.testing.assert_allclose(ours["mAP"], ce.stats[0], atol=1e-6)
    np.testing.assert_allclose(ours["mAP_50"], ce.stats[1], atol=1e-6)
    np.testing.assert_allclose(ours["AR@100"], ce.stats[8], atol=1e-6)
