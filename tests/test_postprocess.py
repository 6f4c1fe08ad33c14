import jax.numpy as jnp
import numpy as np

from radet_tpu.core import generate_anchors
from radet_tpu.models.postprocess import get_bboxes

TEST_CFG = dict(
    nms_pre=1000,
    score_thr=0.05,
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


def _level_maps(img=(128, 160), c=3, batch=1):
    anchors, _, _, counts = generate_anchors(img)
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    cls_list = [np.full((batch, h, w, c), -10.0, np.float32) for h, w in sizes]
    reg_list = [np.zeros((batch, h, w, 4), np.float32) for h, w in sizes]
    iou_list = [np.zeros((batch, h, w, 1), np.float32) for h, w in sizes]
    level_anchors = np.split(anchors, np.cumsum(counts)[:-1])
    return cls_list, reg_list, iou_list, level_anchors


def test_single_strong_detection():
    cls_list, reg_list, iou_list, level_anchors = _level_maps()
    # level 0 (stride 8), cell (5, 6): anchor centered (48, 40), side 64
    cls_list[0][0, 5, 6, 1] = 4.0  # sigmoid ~ 0.982
    iou_list[0][0, 5, 6, 0] = 2.0  # sigmoid ~ 0.881
    # tblr offsets in stride units: t=2,b=3,l=1,r=2 -> box (40,24,64,64)
    reg_list[0][0, 5, 6] = [2.0, 3.0, 1.0, 2.0]

    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.ones((1, 4)),
        test_cfg=TEST_CFG,
    )
    valid = np.asarray(det.valid[0])
    assert valid.sum() == 1
    box = np.asarray(det.boxes[0][0])
    np.testing.assert_allclose(box, [48 - 8, 40 - 16, 48 + 16, 40 + 24], atol=1e-3)
    assert int(det.labels[0][0]) == 1
    score = float(det.scores[0][0])
    np.testing.assert_allclose(score, (1 / (1 + np.exp(-4.0))) * (1 / (1 + np.exp(-2.0))), rtol=1e-4)


def test_rescale_divides_boxes():
    cls_list, reg_list, iou_list, level_anchors = _level_maps()
    cls_list[0][0, 5, 6, 0] = 4.0
    reg_list[0][0, 5, 6] = [2.0, 2.0, 2.0, 2.0]
    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.full((1, 4), 2.0),
        test_cfg=TEST_CFG,
    )
    box = np.asarray(det.boxes[0][0])
    np.testing.assert_allclose(box, np.array([32, 24, 64, 56]) / 2.0, atol=1e-3)


def test_clustered_boxes_vote():
    cls_list, reg_list, iou_list, level_anchors = _level_maps()
    # two adjacent cells predicting overlapping boxes of the same class
    for (i, j) in [(5, 6), (5, 7)]:
        cls_list[0][0, i, j, 2] = 3.0
        iou_list[0][0, i, j, 0] = 3.0
        reg_list[0][0, i, j] = [3.0, 3.0, 3.0, 3.0]
    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.ones((1, 4)),
        test_cfg=TEST_CFG,
    )
    valid = np.asarray(det.valid[0])
    # boxes (24..72) x and (32..80) x shifted by 8 -> IoU 40/56 > 0.65 -> one cluster
    assert valid.sum() == 1


def test_plain_nms_fallback_path():
    """test_cfg.nms.type='nms' routes to batched_nms_device ranked by
    cls*iou (radet_head.py:160-163 fallback semantics)."""
    cls_list, reg_list, iou_list, level_anchors = _level_maps()
    # two overlapping detections, same class: higher cls*iou wins, seed box kept
    for (i, j), (c, q) in zip([(5, 6), (5, 7)], [(2.0, 3.0), (3.0, 1.0)]):
        cls_list[0][0, i, j, 1] = c
        iou_list[0][0, i, j, 0] = q
        reg_list[0][0, i, j] = [3.0, 3.0, 3.0, 3.0]
    cfg = dict(nms_pre=1000, score_thr=0.05, max_per_img=10,
               nms=dict(type="nms", iou_threshold=0.5))
    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.ones((1, 4)),
        test_cfg=cfg,
    )
    valid = np.asarray(det.valid[0])
    assert valid.sum() == 1
    # winner: cell (5,6) with sigmoid(2)*sigmoid(3) = .846 > sigmoid(3)*sigmoid(1) = .696
    want = (1 / (1 + np.exp(-2.0))) * (1 / (1 + np.exp(-3.0)))
    np.testing.assert_allclose(float(det.scores[0][0]), want, rtol=1e-4)
    # plain NMS keeps the seed box unmodified (no voting): centered at (48,40)
    np.testing.assert_allclose(
        np.asarray(det.boxes[0][0]), [48 - 24, 40 - 24, 48 + 24, 40 + 24], atol=1e-3
    )


def test_resolve_score_variants():
    import jax.numpy as jnp2

    from radet_tpu.models.postprocess import _resolve_score

    cls = jnp2.asarray([0.5, 0.8])
    iou = jnp2.asarray([0.4, 0.9])
    np.testing.assert_allclose(np.asarray(_resolve_score("cls", cls, iou)), [0.5, 0.8])
    np.testing.assert_allclose(np.asarray(_resolve_score("iou", cls, iou)), [0.4, 0.9])
    np.testing.assert_allclose(
        np.asarray(_resolve_score(["cls", "iou"], cls, iou)), [0.2, 0.72], rtol=1e-6
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _resolve_score("bogus", cls, iou)


def test_below_threshold_filtered():
    cls_list, reg_list, iou_list, level_anchors = _level_maps()
    cls_list[0][0, 5, 6, 1] = -4.0  # sigmoid ~ 0.018 < 0.05
    det = get_bboxes(
        [jnp.asarray(x) for x in cls_list],
        [jnp.asarray(x) for x in reg_list],
        [jnp.asarray(x) for x in iou_list],
        level_anchors,
        jnp.asarray([[128.0, 160.0]]),
        jnp.ones((1, 4)),
        test_cfg=TEST_CFG,
    )
    assert np.asarray(det.valid).sum() == 0
