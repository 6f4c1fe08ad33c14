"""DeltaXYWH / legacy / YOLO coder parity.

Expected tensors are the reference's own executable docstring examples
(/root/reference/radet/core/bbox/coder/delta_xywh_bbox_coder.py:156-169,
legacy_delta_xywh_bbox_coder.py:160-173) plus round-trip identities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core.box_coder import (
    build_bbox_coder,
    delta_decode,
    delta_encode,
    legacy_delta_decode,
    legacy_delta_encode,
    yolo_decode,
    yolo_encode,
)

ROIS = np.array(
    [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0],
     [5.0, 5.0, 5.0, 5.0]],
    np.float32,
)
DELTAS = np.array(
    [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 2.0, -1.0],
     [0.7, -1.9, -0.5, 0.3]],
    np.float32,
)


def test_delta_decode_docstring_example():
    out = np.asarray(delta_decode(ROIS, DELTAS, max_shape=(32, 32)))
    expected = np.array(
        [
            [0.0000, 0.0000, 1.0000, 1.0000],
            [0.1409, 0.1409, 2.8591, 2.8591],
            [0.0000, 0.3161, 4.1945, 0.6839],
            [5.0000, 5.0000, 5.0000, 5.0000],
        ]
    )
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_legacy_delta_decode_docstring_example():
    out = np.asarray(legacy_delta_decode(ROIS, DELTAS, max_shape=(32, 32)))
    expected = np.array(
        [
            [0.0000, 0.0000, 1.5000, 1.5000],
            [0.0000, 0.0000, 5.2183, 5.2183],
            [0.0000, 0.1321, 7.8891, 0.8679],
            [5.3967, 2.4251, 6.0033, 3.7749],
        ]
    )
    np.testing.assert_allclose(out, expected, atol=1e-4)


@pytest.mark.parametrize(
    "means,stds",
    [((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0)),
     ((0.1, -0.1, 0.2, 0.05), (0.1, 0.2, 0.3, 0.4))],
)
def test_delta_roundtrip(means, stds):
    rng = np.random.RandomState(0)
    anchors = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 50, (64, 2))
    gts = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    gts[:, 2:] = gts[:, :2] + rng.uniform(5, 50, (64, 2))
    enc = delta_encode(anchors, gts, means, stds)
    dec = delta_decode(anchors, enc, means, stds)
    np.testing.assert_allclose(np.asarray(dec), gts, rtol=1e-4, atol=1e-3)


def test_legacy_roundtrip_half_pixel():
    # the reference legacy decode deliberately OMITS the +-0.5 v1.x corner
    # correction (legacy_delta_xywh_bbox_coder.py:192-196 comment), so
    # decode(encode(gt)) == gt grown by exactly half a pixel per side
    rng = np.random.RandomState(1)
    anchors = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 50, (32, 2))
    gts = anchors + rng.uniform(-3, 3, (32, 4)).astype(np.float32)
    enc = legacy_delta_encode(anchors, gts)
    dec = legacy_delta_decode(anchors, enc)
    expected = gts + np.array([-0.5, -0.5, 0.5, 0.5], np.float32)
    np.testing.assert_allclose(np.asarray(dec), expected, rtol=1e-4, atol=1e-3)


def test_delta_wh_ratio_clip():
    # huge dw must clamp at |log(16/1000)|
    anchors = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    deltas = np.array([[0.0, 0.0, 50.0, -50.0]], np.float32)
    out = np.asarray(delta_decode(anchors, deltas))
    max_ratio = abs(np.log(16 / 1000))
    w = out[0, 2] - out[0, 0]
    h = out[0, 3] - out[0, 1]
    np.testing.assert_allclose(w, 10 * np.exp(max_ratio), rtol=1e-5)
    np.testing.assert_allclose(h, 10 * np.exp(-max_ratio), rtol=1e-5)


def test_delta_batched_broadcast():
    # (B, N, 4) deltas against (N, 4) anchors — the shape the dense loss uses
    rng = np.random.RandomState(2)
    anchors = rng.uniform(10, 50, (16, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + 10
    deltas = rng.randn(4, 16, 4).astype(np.float32) * 0.1
    out = delta_decode(anchors[None], deltas)
    assert out.shape == (4, 16, 4)
    one = delta_decode(anchors, deltas[2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(one), rtol=1e-6)


def test_yolo_roundtrip_and_range():
    rng = np.random.RandomState(3)
    anchors = np.tile(np.array([[0.0, 0.0, 32.0, 32.0]], np.float32), (8, 1))
    gts = anchors + rng.uniform(-8, 8, (8, 4)).astype(np.float32)
    enc = np.asarray(yolo_encode(anchors, gts, stride=32.0))
    assert (enc[:, :2] > 0).all() and (enc[:, :2] < 1).all()
    dec = np.asarray(yolo_decode(anchors, enc, stride=32.0))
    np.testing.assert_allclose(dec, np.asarray(gts), rtol=1e-4, atol=1e-3)


def test_build_bbox_coder_dispatch():
    enc, dec = build_bbox_coder(
        dict(type="DeltaXYWHBBoxCoder", target_means=(0, 0, 0, 0),
             target_stds=(0.1, 0.1, 0.2, 0.2))
    )
    a = jnp.asarray(ROIS[:3])  # skip the zero-size roi: encode divides by w
    g = a + 1.0
    np.testing.assert_allclose(
        np.asarray(dec(a, enc(a, g))), np.asarray(g), rtol=1e-4, atol=1e-3
    )
    enc_t, dec_t = build_bbox_coder(dict(type="TBLRBBoxCoder", normalizer=0.25))
    anchors = np.array([[0.0, 0.0, 16.0, 16.0]], np.float32)
    gt = np.array([[2.0, 2.0, 12.0, 14.0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(dec_t(anchors, enc_t(anchors, gt))), gt, rtol=1e-5
    )
    with pytest.raises(KeyError):
        build_bbox_coder(dict(type="BucketingBBoxCoder", num_buckets=14))
