"""VOC-style mAP/recall evaluation (evaluation/voc_eval.py) — hand-computed
scenes covering the reference protocol's semantics (mean_ap.py, recall.py):
argmax-GT-only matching, ignore regions, scale ranges, both AP modes, and
the greedy one-to-one proposal-recall assignment."""

import numpy as np
import pytest

from radet_tpu.evaluation.voc_eval import (
    average_precision,
    bbox_overlaps_np,
    eval_map,
    eval_recalls,
    tpfp_image,
)


def _det(x1, y1, x2, y2, s):
    return np.asarray([x1, y1, x2, y2, s], np.float32)


def test_average_precision_area_mode():
    # one TP at recall 1.0 with precision 1.0 -> AP 1
    assert average_precision(np.asarray([1.0]), np.asarray([1.0])) == 1.0
    # recall reaches 0.5 with precision 1.0 -> AP 0.5
    np.testing.assert_allclose(
        average_precision(np.asarray([0.5]), np.asarray([1.0])), 0.5
    )
    # classic staircase
    rc = np.asarray([0.5, 0.5, 1.0])
    pr = np.asarray([1.0, 0.5, 2.0 / 3.0])
    np.testing.assert_allclose(average_precision(rc, pr), 0.5 + 0.5 * 2 / 3, atol=1e-6)


def test_average_precision_11points():
    rc = np.asarray([0.5, 1.0])
    pr = np.asarray([1.0, 0.5])
    # thresholds 0..0.5 see max precision 1.0 (6 pts), 0.6..1.0 see 0.5 (5)
    np.testing.assert_allclose(
        average_precision(rc, pr, "11points"), (6 * 1.0 + 5 * 0.5) / 11, atol=1e-6
    )


def test_tpfp_basic_and_double_detection():
    gts = np.asarray([[0, 0, 10, 10]], np.float32)
    dets = np.stack([
        _det(0, 0, 10, 10, 0.9),   # tp
        _det(1, 0, 11, 10, 0.8),   # same gt, already covered -> fp
        _det(50, 50, 60, 60, 0.7), # no overlap -> fp
    ])
    tp, fp = tpfp_image(dets, gts)
    np.testing.assert_array_equal(tp[0], [1, 0, 0])
    np.testing.assert_array_equal(fp[0], [0, 1, 1])


def test_tpfp_argmax_only_quirk():
    """A detection whose ARGMAX GT is covered is FP even if another free GT
    clears the IoU threshold (reference mean_ap.py:204-236)."""
    gts = np.asarray([[0, 0, 10, 10], [2, 0, 12, 10]], np.float32)
    # det B overlaps gt0 slightly more than gt1, but gt0 is taken by det A
    dets = np.stack([
        _det(0, 0, 10, 10, 0.9),       # exact match gt0
        _det(0.5, 0, 10.5, 10, 0.8),   # argmax gt0 (covered) -> fp
    ])
    iou = bbox_overlaps_np(dets[1:2, :4], gts)[0]
    assert iou.argmax() == 0 and iou[1] > 0.5  # scene constructed correctly
    tp, fp = tpfp_image(dets, gts)
    np.testing.assert_array_equal(tp[0], [1, 0])
    np.testing.assert_array_equal(fp[0], [0, 1])


def test_tpfp_ignore_regions():
    gts = np.zeros((0, 4), np.float32)
    ignore = np.asarray([[0, 0, 10, 10]], np.float32)
    dets = np.stack([_det(0, 0, 10, 10, 0.9), _det(30, 30, 40, 40, 0.8)])
    tp, fp = tpfp_image(dets, gts, ignore)
    # det on the ignore region: neither tp nor fp; the other: fp
    np.testing.assert_array_equal(tp[0], [0, 0])
    np.testing.assert_array_equal(fp[0], [0, 1])


def test_tpfp_area_ranges():
    gts = np.asarray([[0, 0, 10, 10], [20, 20, 120, 120]], np.float32)  # 100, 10000
    dets = np.stack([_det(0, 0, 10, 10, 0.9), _det(20, 20, 120, 120, 0.8)])
    ranges = [(0, 1000), (1000, 1e8)]
    tp, fp = tpfp_image(dets, gts, None, 0.5, ranges)
    np.testing.assert_array_equal(tp, [[1, 0], [0, 1]])
    # the out-of-range detection matched an (area-)ignored gt: not fp
    np.testing.assert_array_equal(fp, [[0, 0], [0, 0]])


def test_eval_map_two_classes():
    # class 0: 2 gts, both found (1 extra fp); class 1: 1 gt, missed
    annotations = [
        dict(
            bboxes=np.asarray([[0, 0, 10, 10], [30, 30, 50, 50]], np.float32),
            labels=np.asarray([0, 0]),
        ),
        dict(bboxes=np.asarray([[5, 5, 25, 25]], np.float32), labels=np.asarray([1])),
    ]
    det_results = [
        [
            np.stack([_det(0, 0, 10, 10, 0.9), _det(30, 30, 50, 50, 0.8), _det(70, 70, 90, 90, 0.3)]),
            np.zeros((0, 5), np.float32),
        ],
        [np.zeros((0, 5), np.float32), np.zeros((0, 5), np.float32)],
    ]
    mean_ap, per_class = eval_map(det_results, annotations)
    np.testing.assert_allclose(per_class[0]["ap"], 1.0, atol=1e-6)
    np.testing.assert_allclose(per_class[1]["ap"], 0.0, atol=1e-6)
    np.testing.assert_allclose(mean_ap, 0.5, atol=1e-6)
    assert per_class[0]["num_gts"] == 2 and per_class[1]["num_gts"] == 1


def test_eval_map_scale_ranges():
    annotations = [
        dict(
            bboxes=np.asarray([[0, 0, 10, 10], [20, 20, 120, 120]], np.float32),
            labels=np.asarray([0, 0]),
        )
    ]
    det_results = [[np.stack([_det(0, 0, 10, 10, 0.9), _det(20, 20, 120, 120, 0.8)])]]
    mean_ap, per_class = eval_map(
        det_results, annotations, scale_ranges=[(0, 32), (32, 1000)]
    )
    np.testing.assert_allclose(mean_ap, [1.0, 1.0], atol=1e-6)


def test_eval_map_empty_class_not_averaged():
    annotations = [dict(bboxes=np.asarray([[0, 0, 10, 10]], np.float32), labels=np.asarray([0]))]
    det_results = [[np.stack([_det(0, 0, 10, 10, 0.9)]), np.zeros((0, 5), np.float32)]]
    mean_ap, _ = eval_map(det_results, annotations)
    np.testing.assert_allclose(mean_ap, 1.0, atol=1e-6)  # class 1 has no GT


def test_eval_recalls():
    gts = [np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
    proposals = [
        np.asarray(
            [[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8], [20, 20, 40, 40, 0.7]],
            np.float32,
        )
    ]
    r = eval_recalls(gts, proposals, proposal_nums=(1, 3), iou_thrs=(0.5,))
    np.testing.assert_allclose(r[0, 0], 0.5)  # top-1: only the first gt found
    np.testing.assert_allclose(r[1, 0], 1.0)  # top-3: both
    # greedy one-to-one: a single proposal cannot cover two gts
    r2 = eval_recalls(
        [np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)],
        [np.asarray([[0, 0, 10, 10]], np.float32)],
        proposal_nums=(10,),
        iou_thrs=(0.3,),
    )
    np.testing.assert_allclose(r2[0, 0], 0.5)


def test_eval_recalls_unscored_proposals():
    gts = [np.asarray([[0, 0, 10, 10]], np.float32)]
    proposals = [np.asarray([[0, 0, 10, 10]], np.float32)]  # (K, 4), no score
    r = eval_recalls(gts, proposals, proposal_nums=(1,), iou_thrs=(0.5, 0.95))
    np.testing.assert_allclose(r, [[1.0, 1.0]])
