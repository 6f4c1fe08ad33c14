"""Differential validation of radet_tpu.evaluation.coco_eval against the
vendored pycocotools-protocol transcription (tests/cocoeval_oracle.py).

Replaces the environment-gated pycocotools test (VERDICT r1 item 3): the
evaluator is the instrument every parity claim is measured with, so it is
exercised here on randomized scenes covering crowd GTs, explicit ignore
flags, all area ranges, maxDets truncation (>100 dets/image), score ties,
empty images/categories, and degenerate boxes — comparing the FULL
precision/recall tensors, not just the 12 summary numbers.
"""

import json

import numpy as np
import pytest

from radet_tpu.data.coco_io import CocoIndex
from radet_tpu.evaluation import COCOEvaluator

from cocoeval_oracle import COCOevalOracle


def _build_gt_file(tmp_path, anns, num_imgs, num_cats, name="gt.json"):
    data = dict(
        images=[
            dict(id=i + 1, width=640, height=480, file_name=f"{i}.jpg")
            for i in range(num_imgs)
        ],
        annotations=anns,
        categories=[dict(id=c + 1, name=f"c{c}") for c in range(num_cats)],
    )
    p = tmp_path / name
    p.write_text(json.dumps(data))
    return str(p)


def _random_scene(
    rng,
    num_imgs=4,
    num_cats=3,
    crowd_frac=0.15,
    ignore_frac=0.1,
    det_per_gt=0.85,
    fp_per_img=6,
    score_quant=None,
    max_extra_dets=0,
):
    anns, dets = [], []
    aid = 1
    for img in range(1, num_imgs + 1):
        for _ in range(rng.randint(2, 9)):
            # areas spanning small (<32^2), medium, large (>96^2)
            w = float(rng.choice([8, 20, 40, 80, 120, 200]) + rng.randint(0, 10))
            h = float(rng.choice([8, 20, 40, 80, 120, 200]) + rng.randint(0, 10))
            x = float(rng.randint(0, max(1, 640 - int(w))))
            y = float(rng.randint(0, max(1, 480 - int(h))))
            cat = int(rng.randint(1, num_cats + 1))
            ann = dict(
                id=aid,
                image_id=img,
                category_id=cat,
                bbox=[x, y, w, h],
                area=w * h,
                iscrowd=int(rng.rand() < crowd_frac),
            )
            if rng.rand() < ignore_frac:
                ann["ignore"] = 1
            anns.append(ann)
            aid += 1
            if rng.rand() < det_per_gt:
                bx = [
                    x + float(rng.randn() * 8),
                    y + float(rng.randn() * 8),
                    w * float(1 + rng.randn() * 0.15),
                    h * float(1 + rng.randn() * 0.15),
                ]
                bx[2] = max(bx[2], 1.0)
                bx[3] = max(bx[3], 1.0)
                s = float(rng.rand())
                if score_quant:
                    s = round(s * score_quant) / score_quant
                dets.append(
                    dict(image_id=img, category_id=cat, bbox=bx, score=s)
                )
        for _ in range(fp_per_img + rng.randint(0, max_extra_dets + 1)):
            w = float(rng.randint(5, 200))
            h = float(rng.randint(5, 200))
            s = float(rng.rand())
            if score_quant:
                s = round(s * score_quant) / score_quant
            dets.append(
                dict(
                    image_id=int(rng.randint(1, num_imgs + 1)),
                    category_id=int(rng.randint(1, num_cats + 1)),
                    bbox=[float(rng.randint(0, 600)), float(rng.randint(0, 440)), w, h],
                    score=s,
                )
            )
    return anns, dets


def _compare(tmp_path, anns, dets, num_imgs, num_cats, name):
    gt_file = _build_gt_file(tmp_path, anns, num_imgs, num_cats, name)
    cat_ids = list(range(1, num_cats + 1))
    ev = COCOEvaluator(CocoIndex(gt_file), cat_ids=cat_ids)
    ours = ev.evaluate(list(dets))
    oracle = COCOevalOracle(
        anns, dets, img_ids=list(range(1, num_imgs + 1)), cat_ids=cat_ids
    ).run()
    want = oracle.summarize()
    np.testing.assert_allclose(
        ev.precision, oracle.precision, atol=1e-9,
        err_msg="precision tensor mismatch",
    )
    np.testing.assert_allclose(
        ev.recall, oracle.recall, atol=1e-9, err_msg="recall tensor mismatch"
    )
    for k, v in want.items():
        np.testing.assert_allclose(ours[k], v, atol=1e-9, err_msg=k)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_scenes(tmp_path, seed):
    rng = np.random.RandomState(seed)
    anns, dets = _random_scene(rng)
    _compare(tmp_path, anns, dets, 4, 3, f"s{seed}.json")


def test_score_ties(tmp_path):
    """Quantized scores produce heavy ties; stable-sort order must agree."""
    rng = np.random.RandomState(100)
    anns, dets = _random_scene(rng, score_quant=4, fp_per_img=10)
    _compare(tmp_path, anns, dets, 4, 3, "ties.json")


def test_maxdet_truncation(tmp_path):
    """>100 detections in one image exercises the maxDets cap at matching
    AND accumulate time."""
    rng = np.random.RandomState(7)
    anns, dets = _random_scene(rng, num_imgs=2, fp_per_img=120)
    assert max(
        sum(1 for d in dets if d["image_id"] == i) for i in (1, 2)
    ) > 100
    _compare(tmp_path, anns, dets, 2, 3, "maxdet.json")


def test_all_crowd_and_ignore(tmp_path):
    rng = np.random.RandomState(11)
    anns, dets = _random_scene(rng, crowd_frac=0.6, ignore_frac=0.5)
    _compare(tmp_path, anns, dets, 4, 3, "crowd.json")


def test_empty_categories_and_images(tmp_path):
    """A category with GT but no dets, a category with dets but no GT, and an
    image with neither."""
    anns = [
        dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 50, 50], area=2500.0, iscrowd=0),
        dict(id=2, image_id=2, category_id=2, bbox=[30, 30, 120, 120], area=14400.0, iscrowd=0),
    ]
    dets = [
        dict(image_id=1, category_id=1, bbox=[12, 11, 50, 49], score=0.9),
        dict(image_id=1, category_id=3, bbox=[200, 200, 40, 40], score=0.7),
    ]
    _compare(tmp_path, anns, dets, 3, 3, "empty.json")


def test_degenerate_boxes(tmp_path):
    """Zero-width/height detections and exact-duplicate detections."""
    anns = [
        dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 60, 60], area=3600.0, iscrowd=0),
    ]
    dets = [
        dict(image_id=1, category_id=1, bbox=[10, 10, 60, 60], score=0.8),
        dict(image_id=1, category_id=1, bbox=[10, 10, 60, 60], score=0.8),
        dict(image_id=1, category_id=1, bbox=[5, 5, 0, 30], score=0.9),
        dict(image_id=1, category_id=1, bbox=[5, 5, 30, 0], score=0.85),
    ]
    _compare(tmp_path, anns, dets, 1, 1, "degen.json")


def test_no_detections_at_all(tmp_path):
    anns = [
        dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 60, 60], area=3600.0, iscrowd=0),
    ]
    _compare(tmp_path, anns, [], 1, 1, "nodet.json")
