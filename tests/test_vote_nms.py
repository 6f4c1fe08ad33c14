import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.ops import vote_nms_device, vote_nms_device_fast, vote_nms_numpy


def _random_dets(rng, n=60, num_labels=3):
    # clusters of boxes around a few ground positions
    centers = rng.uniform(50, 400, (8, 2))
    idx = rng.randint(0, 8, n)
    cx = centers[idx, 0] + rng.randn(n) * 3
    cy = centers[idx, 1] + rng.randn(n) * 3
    w = rng.uniform(40, 60, n)
    h = rng.uniform(40, 60, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    cluster = rng.uniform(0.1, 1.0, n).astype(np.float32)
    vote = rng.uniform(0.1, 1.0, n).astype(np.float32)
    labels = (idx % num_labels).astype(np.int32)
    return boxes, cluster, vote, labels


@pytest.mark.parametrize("global_mode", [False, True])
@pytest.mark.parametrize("iou_enable", [False, True])
def test_device_matches_oracle(rng, global_mode, iou_enable):
    boxes, cluster, vote, labels = _random_dets(rng)
    ob, ol, osc = vote_nms_numpy(
        boxes, cluster, vote, labels, 0.5, iou_enable, 0.025, global_mode
    )
    db, dl, dsc, dv = vote_nms_device(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.ones(len(boxes), bool),
        iou_threshold=0.5,
        max_out=50,
        iou_enable=iou_enable,
        sigma=0.025,
        global_mode=global_mode,
    )
    db, dl, dsc, dv = map(np.asarray, (db, dl, dsc, dv))
    n = int(dv.sum())
    assert n == len(ob)
    np.testing.assert_allclose(db[:n], ob, rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(dl[:n], ol)
    np.testing.assert_allclose(dsc[:n], osc, rtol=1e-5)


@pytest.mark.parametrize("global_mode", [False, True])
@pytest.mark.parametrize("iou_enable", [False, True])
def test_fast_matches_oracle(rng, global_mode, iou_enable):
    boxes, cluster, vote, labels = _random_dets(rng, n=80)
    ob, ol, osc = vote_nms_numpy(
        boxes, cluster, vote, labels, 0.5, iou_enable, 0.025, global_mode
    )
    db, dl, dsc, dv = vote_nms_device_fast(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.ones(len(boxes), bool),
        iou_threshold=0.5,
        max_out=60,
        iou_enable=iou_enable,
        sigma=0.025,
        global_mode=global_mode,
    )
    db, dl, dsc, dv = map(np.asarray, (db, dl, dsc, dv))
    n = int(dv.sum())
    assert n == len(ob)
    np.testing.assert_allclose(db[:n], ob, rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(dl[:n], ol)
    np.testing.assert_allclose(dsc[:n], osc, rtol=1e-5)


def test_fast_invalid_and_truncation(rng):
    boxes, cluster, vote, labels = _random_dets(rng, n=40)
    valid = np.ones(40, bool)
    valid[25:] = False
    ob, ol, osc = vote_nms_numpy(
        boxes[:25], cluster[:25], vote[:25], labels[:25], 0.5, False, 0.025, False
    )
    k = min(3, len(ob))
    db, dl, dsc, dv = vote_nms_device_fast(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.asarray(valid),
        iou_threshold=0.5,
        max_out=k,
    )
    np.testing.assert_allclose(np.asarray(db)[:k], ob[:k], rtol=1e-3, atol=1e-2)
    assert int(np.asarray(dv).sum()) == k


def test_fast_deep_chain(rng):
    """Chained overlaps exercise multi-round fixed-point convergence."""
    # boxes in a line, each overlapping only its neighbor (IoU ~ 0.54)
    n = 12
    boxes = np.stack(
        [
            10.0 * np.arange(n),
            np.zeros(n),
            10.0 * np.arange(n) + 40,
            np.full(n, 40.0),
        ],
        -1,
    ).astype(np.float32)
    cluster = np.linspace(1.0, 0.5, n).astype(np.float32)  # descending
    vote = np.ones(n, np.float32)
    labels = np.zeros(n, np.int32)
    ob, ol, osc = vote_nms_numpy(boxes, cluster, vote, labels, 0.5, False, 0.025, False)
    db, dl, dsc, dv = vote_nms_device_fast(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.ones(n, bool),
        iou_threshold=0.5,
        max_out=12,
    )
    m = int(np.asarray(dv).sum())
    assert m == len(ob)
    np.testing.assert_allclose(np.asarray(db)[:m], ob, rtol=1e-4, atol=1e-3)


def test_invalid_slots_ignored(rng):
    boxes, cluster, vote, labels = _random_dets(rng, n=30)
    valid = np.ones(30, bool)
    valid[10:] = False
    ob, ol, osc = vote_nms_numpy(
        boxes[:10], cluster[:10], vote[:10], labels[:10], 0.5, False, 0.025, False
    )
    db, dl, dsc, dv = vote_nms_device(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.asarray(valid),
        iou_threshold=0.5,
        max_out=20,
    )
    n = int(np.asarray(dv).sum())
    assert n == len(ob)
    np.testing.assert_allclose(np.asarray(db)[:n], ob, rtol=1e-3, atol=1e-2)


def test_max_out_truncation(rng):
    boxes, cluster, vote, labels = _random_dets(rng, n=80)
    ob, ol, osc = vote_nms_numpy(boxes, cluster, vote, labels, 0.5, False, 0.025, False)
    k = min(3, len(ob))
    db, dl, dsc, dv = vote_nms_device(
        jnp.asarray(boxes),
        jnp.asarray(cluster),
        jnp.asarray(vote),
        jnp.asarray(labels),
        jnp.ones(len(boxes), bool),
        iou_threshold=0.5,
        max_out=k,
    )
    np.testing.assert_allclose(np.asarray(db)[:k], ob[:k], rtol=1e-3, atol=1e-2)


def test_single_box():
    boxes = np.array([[0, 0, 10, 10]], np.float32)
    db, dl, dsc, dv = vote_nms_device(
        jnp.asarray(boxes),
        jnp.asarray([0.9], dtype=np.float32),
        jnp.asarray([0.8], dtype=np.float32),
        jnp.asarray([2], dtype=np.int32),
        jnp.ones(1, bool),
        iou_threshold=0.65,
        max_out=5,
    )
    assert int(np.asarray(dv).sum()) == 1
    np.testing.assert_allclose(np.asarray(db)[0], boxes[0], atol=1e-4)
    assert int(np.asarray(dl)[0]) == 2
    np.testing.assert_allclose(float(np.asarray(dsc)[0]), 0.9, rtol=1e-6)


@pytest.mark.parametrize("global_mode", [False, True])
def test_fast_presorted_equivalence(rng, global_mode):
    """presorted=True on score-sorted input (invalid last) == presorted=False.

    This is the contract the postprocess nms_topk reduction provides
    (models/postprocess.py: top_k by cluster score, invalid at NEG_INF)."""
    boxes, cluster, vote, labels = _random_dets(rng, n=64)
    valid = rng.rand(len(boxes)) > 0.2
    masked = np.where(valid, cluster, -1e30)
    order = np.argsort(-masked, kind="stable")
    args_sorted = (
        jnp.asarray(boxes[order]),
        jnp.asarray(cluster[order]),
        jnp.asarray(vote[order]),
        jnp.asarray(labels[order]),
        jnp.asarray(valid[order]),
    )
    kw = dict(iou_threshold=0.5, max_out=40, global_mode=global_mode)
    ref = vote_nms_device_fast(*args_sorted, presorted=False, **kw)
    fast = vote_nms_device_fast(*args_sorted, presorted=True, **kw)
    for r, f in zip(ref, fast):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(f))


def _fast_nms_oracle(boxes, scores, score_thr, iou_thr, top_k):
    """Sequential transcription of YOLACT fast NMS semantics
    (reference core/post_processing/bbox_nms.py:82-150)."""
    kept = []
    c = scores.shape[1]
    for cls in range(c):
        order = np.argsort(-scores[:, cls], kind="stable")[:top_k]
        cls_boxes = boxes[order]
        cls_scores = scores[order, cls]
        k = len(order)
        for m in range(k):
            iou_max = 0.0
            for j in range(m):  # relaxed: earlier dets suppress regardless of own fate
                xl = max(cls_boxes[m, 0], cls_boxes[j, 0]); yt = max(cls_boxes[m, 1], cls_boxes[j, 1])
                xr = min(cls_boxes[m, 2], cls_boxes[j, 2]); yb = min(cls_boxes[m, 3], cls_boxes[j, 3])
                inter = max(0, xr - xl) * max(0, yb - yt)
                a_m = (cls_boxes[m, 2] - cls_boxes[m, 0]) * (cls_boxes[m, 3] - cls_boxes[m, 1])
                a_j = (cls_boxes[j, 2] - cls_boxes[j, 0]) * (cls_boxes[j, 3] - cls_boxes[j, 1])
                iou_max = max(iou_max, inter / max(a_m + a_j - inter, 1e-12))
            if iou_max <= iou_thr and cls_scores[m] > score_thr:
                kept.append((cls_scores[m], cls, tuple(cls_boxes[m])))
    kept.sort(key=lambda t: -t[0])
    return kept


def test_fast_nms_matches_oracle(rng):
    from radet_tpu.ops import fast_nms_device

    n, c = 60, 4
    boxes, _, _, _ = _random_dets(rng, n=n)
    scores = rng.rand(n, c).astype(np.float32)
    ob, ol, osc, ov = map(
        np.asarray,
        fast_nms_device(
            jnp.asarray(boxes), jnp.asarray(scores),
            score_thr=0.3, iou_threshold=0.5, top_k=40, max_out=30,
        ),
    )
    oracle = _fast_nms_oracle(boxes, scores, 0.3, 0.5, 40)[:30]
    nk = int(ov.sum())
    assert nk == len(oracle)
    for m in range(nk):
        np.testing.assert_allclose(osc[m], oracle[m][0], rtol=1e-6)
        assert ol[m] == oracle[m][1]
        np.testing.assert_allclose(ob[m], oracle[m][2], rtol=1e-5)
