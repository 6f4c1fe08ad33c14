"""Native C++ host ops: differential tests against the numpy oracles."""

import numpy as np
import pytest

from radet_tpu.ops import native
from radet_tpu.ops.distance_transform import (
    border_seeds,
    boxes_to_distance_maps,
    gdt_numpy,
    mbd_numpy,
)
from radet_tpu.ops.vote_nms import vote_nms_numpy

HAS_NATIVE = native.load() is not None


def test_native_builds():
    assert HAS_NATIVE, "g++ is available in this image; the native lib must build"


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib unavailable")
def test_mbd_native_matches_numpy(rng):
    img = rng.randint(0, 255, (24, 30, 3), np.uint8)
    sx, sy = border_seeds(24, 30, interval=3)
    got = native.mbd(img, sx, sy, alpha=0.1, niter=4, base_size=300)
    want = mbd_numpy(img, sx, sy, alpha=0.1, niter=4, base_size=300)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib unavailable")
def test_gdt_native_matches_numpy(rng):
    cost = rng.rand(20, 26).astype(np.float32)
    sx, sy = border_seeds(20, 26, interval=3)
    got = native.gdt(cost, sx, sy)
    want = gdt_numpy(cost.copy(), sx, sy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mbd_object_brighter_than_border(rng):
    """A distinct centered object must get higher MBD than the background."""
    img = np.full((40, 40, 3), 30, np.uint8)
    img[12:28, 12:28] = [220, 40, 180]
    sx, sy = border_seeds(40, 40)
    dmap = native.mbd(img, sx, sy) if HAS_NATIVE else mbd_numpy(img, sx, sy)
    inside = dmap[16:24, 16:24].mean()
    outside = (dmap[:6].mean() + dmap[-6:].mean()) / 2
    assert inside > outside * 5 + 1e-3


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib unavailable")
@pytest.mark.parametrize("global_mode", [False, True])
def test_vote_nms_native_matches_oracle(rng, global_mode):
    n = 50
    centers = rng.uniform(50, 300, (6, 2))
    idx = rng.randint(0, 6, n)
    cx = centers[idx, 0] + rng.randn(n) * 3
    cy = centers[idx, 1] + rng.randn(n) * 3
    w = rng.uniform(30, 50, n)
    h = rng.uniform(30, 50, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    cs = rng.uniform(0.1, 1, n).astype(np.float32)
    vs = rng.uniform(0.1, 1, n).astype(np.float32)
    labels = (idx % 2).astype(np.int64)
    nb, nl, ns = native.vote_nms_native(boxes, cs, vs, labels, 0.5, False, 0.025, global_mode)
    ob, ol, osc = vote_nms_numpy(boxes, cs, vs, labels, 0.5, False, 0.025, global_mode)
    assert len(nb) == len(ob)
    np.testing.assert_allclose(nb, ob, rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(nl, ol)
    np.testing.assert_allclose(ns, osc, rtol=1e-6)


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib unavailable")
def test_cluster_nms():
    boxes = np.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],  # overlaps box 0
            [100, 100, 110, 110],
            [0.5, 0.5, 10.5, 10.5],  # overlaps box 0
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    ids, sizes = native.cluster_nms(boxes, scores, iou_threshold=0.5)
    assert ids[0] == ids[1] == ids[3]
    assert ids[2] != ids[0]
    assert sizes[0] == 3 and sizes[2] == 1


def test_boxes_to_distance_maps_integration(rng):
    img = np.full((60, 80, 3), 20, np.uint8)
    img[20:50, 30:70] = [200, 120, 60]  # object
    boxes = np.array([[22.0, 12.0, 78.0, 58.0], [2.0, 2.0, 12.0, 12.0]], np.float32)
    dmaps = boxes_to_distance_maps(img, boxes, method="gdt")
    assert dmaps.shape == (2, 60, 80)
    # map zero outside the box
    assert dmaps[0, :10].max() == 0
    # small object (area < 32^2) gets a uniform map
    np.testing.assert_allclose(dmaps[1, 3:11, 3:11], 1.0)
    # object interior scores higher than the background frame inside the box
    assert dmaps[0, 30:40, 45:55].mean() > dmaps[0, 13:18, 35:60].mean() * 1.5
    # MBD path works too
    dmaps_mbd = boxes_to_distance_maps(img, boxes[:1], method="mbd")
    assert dmaps_mbd.shape == (1, 60, 80)
    assert dmaps_mbd[0, 30:40, 45:55].mean() > 0.3
