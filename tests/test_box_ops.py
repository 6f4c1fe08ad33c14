import jax.numpy as jnp
import numpy as np

from radet_tpu.core import bbox_giou_aligned, bbox_iou_aligned, bbox_iou_pairwise


def _iou_np(a, b):
    xl = max(a[0], b[0])
    yt = max(a[1], b[1])
    xr = min(a[2], b[2])
    yb = min(a[3], b[3])
    inter = max(0, xr - xl) * max(0, yb - yt)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def test_iou_aligned_matches_manual(rng):
    a = rng.uniform(0, 100, (20, 2))
    a = np.concatenate([a, a + rng.uniform(5, 50, (20, 2))], -1).astype(np.float32)
    b = rng.uniform(0, 100, (20, 2))
    b = np.concatenate([b, b + rng.uniform(5, 50, (20, 2))], -1).astype(np.float32)
    got = np.asarray(bbox_iou_aligned(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([_iou_np(a[i], b[i]) for i in range(20)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_pairwise_shape_and_values(rng):
    a = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    b = np.array([[0, 0, 10, 10], [100, 100, 110, 110], [5, 0, 15, 10]], np.float32)
    got = np.asarray(bbox_iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(got[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[0, 2], 50 / 150, rtol=1e-5)


def test_giou_properties():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    # identical boxes -> giou = 1
    np.testing.assert_allclose(np.asarray(bbox_giou_aligned(a, a)), [1.0], atol=1e-5)
    # far apart -> giou < 0
    b = jnp.asarray([[100.0, 100, 110, 110]])
    assert float(bbox_giou_aligned(a, b)[0]) < 0
