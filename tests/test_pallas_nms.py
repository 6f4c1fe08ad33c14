"""Pallas fused vote-NMS vs the sequential oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.ops.pallas_nms import vote_nms_pallas
from radet_tpu.ops.vote_nms import vote_nms_numpy

K = 128  # kernel needs a multiple of 128


def _sorted_dets(rng, n_real, num_labels=3, k=K):
    centers = rng.uniform(50, 400, (8, 2))
    idx = rng.randint(0, 8, n_real)
    cx = centers[idx, 0] + rng.randn(n_real) * 3
    cy = centers[idx, 1] + rng.randn(n_real) * 3
    w = rng.uniform(40, 60, n_real)
    h = rng.uniform(40, 60, n_real)
    boxes = np.zeros((k, 4), np.float32)
    boxes[:n_real] = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    cluster = np.zeros(k, np.float32)
    cluster[:n_real] = np.sort(rng.uniform(0.1, 1.0, n_real))[::-1]  # sorted desc
    vote = np.zeros(k, np.float32)
    vote[:n_real] = rng.uniform(0.1, 1.0, n_real)
    labels = np.zeros(k, np.int32)
    labels[:n_real] = (idx % num_labels).astype(np.int32)
    valid = np.zeros(k, bool)
    valid[:n_real] = True
    return boxes, cluster, vote, labels, valid


@pytest.mark.parametrize("global_mode", [False, True])
@pytest.mark.parametrize("iou_enable", [False, True])
def test_pallas_matches_oracle(rng, global_mode, iou_enable):
    batch = []
    oracles = []
    for _ in range(3):
        boxes, cluster, vote, labels, valid = _sorted_dets(rng, n_real=60)
        batch.append((boxes, cluster, vote, labels, valid))
        oracles.append(
            vote_nms_numpy(
                boxes[:60], cluster[:60], vote[:60], labels[:60],
                0.5, iou_enable, 0.025, global_mode,
            )
        )
    stacked = [jnp.asarray(np.stack(x)) for x in zip(*batch)]
    db, dl, dsc, dv = vote_nms_pallas(
        *stacked,
        iou_threshold=0.5,
        max_out=50,
        iou_enable=iou_enable,
        sigma=0.025,
        global_mode=global_mode,
        interpret=True,
    )
    db, dl, dsc, dv = map(np.asarray, (db, dl, dsc, dv))
    for i, (ob, ol, osc) in enumerate(oracles):
        n = int(dv[i].sum())
        assert n == len(ob)
        np.testing.assert_allclose(db[i][:n], ob, rtol=1e-3, atol=1e-2)
        np.testing.assert_array_equal(dl[i][:n], ol)
        np.testing.assert_allclose(dsc[i][:n], osc, rtol=1e-5)


@pytest.mark.parametrize("global_mode", [False, True])
def test_pallas_multitile_matches_oracle(rng, global_mode):
    """K=256 (two 128-tiles) with candidates spanning both tiles: exercises
    the tiled kernel's cross-tile suppression, dedup, seed membership, and
    voting accumulation paths that K=128 cannot reach."""
    k = 256
    boxes, cluster, vote, labels, valid = _sorted_dets(rng, n_real=220, k=k)
    ob, ol, osc = vote_nms_numpy(
        boxes[:220], cluster[:220], vote[:220], labels[:220],
        0.5, False, 0.025, global_mode,
    )
    db, dl, dsc, dv = vote_nms_pallas(
        jnp.asarray(boxes)[None],
        jnp.asarray(cluster)[None],
        jnp.asarray(vote)[None],
        jnp.asarray(labels)[None],
        jnp.asarray(valid)[None],
        iou_threshold=0.5,
        max_out=100,
        global_mode=global_mode,
        interpret=True,
    )
    db, dl, dsc, dv = map(np.asarray, (db, dl, dsc, dv))
    n = int(dv[0].sum())
    assert n == min(len(ob), 100)
    np.testing.assert_allclose(db[0][:n], ob[:n], rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(dl[0][:n], ol[:n])
    np.testing.assert_allclose(dsc[0][:n], osc[:n], rtol=1e-5)


def test_pallas_empty_input(rng):
    boxes = np.zeros((1, K, 4), np.float32)
    z = np.zeros((1, K), np.float32)
    db, dl, dsc, dv = vote_nms_pallas(
        jnp.asarray(boxes),
        jnp.asarray(z),
        jnp.asarray(z),
        jnp.zeros((1, K), jnp.int32),
        jnp.zeros((1, K), bool),
        iou_threshold=0.65,
        max_out=10,
        interpret=True,
    )
    assert int(np.asarray(dv).sum()) == 0


def test_pallas_degenerate_box_self_membership(rng):
    """A kept zero-area box must emit its own coordinates (forced
    self-membership), not collapse to (0, 0, 0, 0) — parity with
    vote_nms_device_fast's cand.at[idx, idx].set(keep)."""
    from radet_tpu.ops.vote_nms import vote_nms_device_fast

    boxes, cluster, vote, labels, valid = _sorted_dets(rng, n_real=20)
    # make the 4th-highest candidate a zero-area box at the border with a
    # distinct label so it survives suppression
    boxes[3] = (77.0, 50.0, 77.0, 120.0)
    labels[3] = 2
    labels[: 3] = 0
    db, dl, dsc, dv = map(
        np.asarray,
        vote_nms_pallas(
            *[jnp.asarray(x)[None] for x in (boxes, cluster, vote, labels, valid)],
            iou_threshold=0.5, max_out=50, interpret=True,
        ),
    )
    fb, fl, fsc, fv = map(
        np.asarray,
        vote_nms_device_fast(
            *[jnp.asarray(x) for x in (boxes, cluster, vote, labels, valid)],
            iou_threshold=0.5, max_out=50, presorted=True,
        ),
    )
    np.testing.assert_array_equal(dv[0], fv)
    kept = fv
    np.testing.assert_allclose(db[0][kept], fb[kept], rtol=1e-4, atol=1e-3)
    # the degenerate box's own coords survived
    emitted = db[0][dv[0]]
    assert any(np.allclose(e, boxes[3], atol=1e-3) for e in emitted)
