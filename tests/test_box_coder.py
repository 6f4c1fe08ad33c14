import jax.numpy as jnp
import numpy as np
import pytest

from radet_tpu.core import tblr_decode, tblr_encode


def test_tblr_roundtrip(rng):
    anchors = np.zeros((50, 4), np.float32)
    cx = rng.uniform(50, 500, 50)
    cy = rng.uniform(50, 400, 50)
    side = rng.choice([64, 128, 256], 50)
    anchors[:, 0] = cx - side / 2
    anchors[:, 1] = cy - side / 2
    anchors[:, 2] = cx + side / 2
    anchors[:, 3] = cy + side / 2
    gts = np.stack(
        [
            cx - rng.uniform(5, 40, 50),
            cy - rng.uniform(5, 40, 50),
            cx + rng.uniform(5, 40, 50),
            cy + rng.uniform(5, 40, 50),
        ],
        axis=-1,
    ).astype(np.float32)
    enc = tblr_encode(jnp.asarray(anchors), jnp.asarray(gts))
    dec = tblr_decode(jnp.asarray(anchors), enc)
    np.testing.assert_allclose(np.asarray(dec), gts, rtol=1e-4, atol=1e-3)


def test_tblr_encode_values():
    # anchor: side 64 centered at (100, 100); gt: (90, 80, 120, 150)
    anchors = jnp.asarray([[68.0, 68.0, 132.0, 132.0]])
    gt = jnp.asarray([[90.0, 80.0, 120.0, 150.0]])
    enc = np.asarray(tblr_encode(anchors, gt, normalizer=1 / 8))
    # t=(100-80)/64*8=2.5, b=(150-100)/64*8=6.25, l=(100-90)/64*8=1.25, r=(120-100)/64*8=2.5
    np.testing.assert_allclose(enc[0], [2.5, 6.25, 1.25, 2.5], rtol=1e-6)


def test_tblr_decode_clip():
    anchors = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    tblr = jnp.asarray([[10.0, 10.0, 10.0, 10.0]])  # large offsets
    dec = np.asarray(tblr_decode(anchors, tblr, max_shape=(100, 120)))
    assert dec[0, 0] >= 0 and dec[0, 1] >= 0
    assert dec[0, 2] <= 120 and dec[0, 3] <= 100


# ---------------------------------------------------------------------------
# BucketingBBoxCoder (reference core/bbox/coder/bucketing_bbox_coder.py)
# ---------------------------------------------------------------------------


def _bucket_oracle_encode(proposals, gt, num_buckets, scale_factor,
                          offset_topk=2, offset_upperbound=1.0,
                          cls_ignore_neighbor=True):
    """numpy transcription of bbox2bucket (:144-268)."""
    import math

    def rescale(b, s):
        c = (b[:, :2] + b[:, 2:]) / 2
        half = (b[:, 2:] - b[:, :2]) / 2 * s
        return np.concatenate([c - half, c + half], 1)

    n = len(proposals)
    side = int(math.ceil(num_buckets / 2.0))
    p = rescale(proposals, scale_factor)
    pw, ph = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]
    bw, bh = pw / num_buckets, ph / num_buckets
    off = 0.5 + np.arange(side)
    l_b = p[:, 0, None] + off * bw[:, None]
    r_b = p[:, 2, None] - off * bw[:, None]
    t_b = p[:, 1, None] + off * bh[:, None]
    d_b = p[:, 3, None] - off * bh[:, None]
    offs = [
        (l_b - gt[:, 0, None]) / bw[:, None],
        (r_b - gt[:, 2, None]) / bw[:, None],
        (t_b - gt[:, 1, None]) / bh[:, None],
        (d_b - gt[:, 3, None]) / bh[:, None],
    ]
    weights, labels, clsw = [], [], []
    for o in offs:
        a = np.abs(o)
        order = np.argsort(a, axis=1, kind="stable")
        w = np.zeros_like(o)
        inds = np.arange(n)
        for k in range(offset_topk):
            lab_k = order[:, k]
            topk_v = a[inds, lab_k]
            if k >= 1:
                w[inds, lab_k] = (topk_v < offset_upperbound).astype(o.dtype)
            else:
                w[inds, lab_k] = 1.0
        weights.append(w)
        lab = np.zeros_like(o)
        lab[inds, order[:, 0]] = 1.0
        labels.append(lab)
        cw = (a < 1).astype(o.dtype)
        if cls_ignore_neighbor:
            cw = (~((cw == 1) & (lab == 0))).astype(o.dtype)
        else:
            cw = np.ones_like(cw)
        clsw.append(cw)
    return (
        np.concatenate(offs, 1),
        np.concatenate(weights, 1),
        np.concatenate(labels, 1),
        np.concatenate(clsw, 1),
    )


@pytest.mark.parametrize("num_buckets,scale_factor", [(14, 1.7), (8, 1.0)])
@pytest.mark.parametrize("cls_ignore_neighbor", [True, False])
def test_bucketing_encode_vs_oracle(num_buckets, scale_factor,
                                    cls_ignore_neighbor):
    from radet_tpu.core.box_coder import bucketing_encode

    rng = np.random.RandomState(3)
    n = 40
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(10, 50, (n, 2))
    proposals = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    gt = proposals + rng.uniform(-6, 6, (n, 4)).astype(np.float32)
    gt = np.concatenate(
        [np.minimum(gt[:, :2], gt[:, 2:] - 1), np.maximum(gt[:, 2:], gt[:, :2] + 1)],
        axis=1,
    )
    got = bucketing_encode(
        jnp.asarray(proposals), jnp.asarray(gt), num_buckets, scale_factor,
        cls_ignore_neighbor=cls_ignore_neighbor,
    )
    want = _bucket_oracle_encode(
        proposals, gt, num_buckets, scale_factor,
        cls_ignore_neighbor=cls_ignore_neighbor,
    )
    for g, w, name in zip(got, want, ("offsets", "weights", "labels", "clsw")):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5,
                                   err_msg=name)


def test_bucketing_roundtrip_recovers_gt():
    """decode(one-hot(labels), true offsets) == gt exactly (the encode
    offsets are defined so the labeled bucket minus offset*unit hits the
    GT edge, bucket2bbox :318-323)."""
    from radet_tpu.core.box_coder import bucketing_decode, bucketing_encode

    rng = np.random.RandomState(5)
    n, nb, sf = 20, 14, 1.7
    side = 7
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(20, 60, (n, 2))
    proposals = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    gt = proposals + rng.uniform(-4, 4, (n, 4)).astype(np.float32)
    offsets, _, labels, _ = bucketing_encode(
        jnp.asarray(proposals), jnp.asarray(gt), nb, sf
    )
    cls_preds = np.asarray(labels) * 50.0  # softmax-argmax = the label
    boxes, conf = bucketing_decode(
        jnp.asarray(proposals), jnp.asarray(cls_preds), offsets, nb, sf
    )
    np.testing.assert_allclose(np.asarray(boxes), gt, rtol=1e-4, atol=1e-3)
    assert np.asarray(conf).shape == (n,)
    assert (np.asarray(conf) > 0.9).all()  # one-hot scores -> confident


def test_bucketing_decode_clip_and_rescoring():
    from radet_tpu.core.box_coder import bucketing_decode

    rng = np.random.RandomState(7)
    n, nb = 8, 8
    side = 4
    proposals = np.tile(np.asarray([0, 0, 40, 40], np.float32), (n, 1))
    cls_preds = rng.randn(n, 4 * side).astype(np.float32)
    offset_preds = rng.randn(n, 4 * side).astype(np.float32) * 5
    boxes, conf = bucketing_decode(
        jnp.asarray(proposals), jnp.asarray(cls_preds),
        jnp.asarray(offset_preds), nb, 1.0, max_shape=(30, 35),
    )
    b = np.asarray(boxes)
    assert (b[:, [0, 2]] <= 34.0 + 1e-5).all() and (b[:, [1, 3]] <= 29.0 + 1e-5).all()
    assert (b >= 0).all()
    # rescoring: mean over 4 sides of top1 (+top2 when adjacent) softmax
    sm = np.exp(cls_preds.reshape(n, 4, side))
    sm /= sm.sum(-1, keepdims=True)
    order = np.argsort(-sm, axis=-1, kind="stable")
    top1 = np.take_along_axis(sm, order[..., :1], -1)[..., 0]
    top2 = np.take_along_axis(sm, order[..., 1:2], -1)[..., 0]
    adj = np.abs(order[..., 0] - order[..., 1]) == 1
    want = (top1 + top2 * adj).mean(-1)
    np.testing.assert_allclose(np.asarray(conf), want, rtol=1e-4)


def test_build_bbox_coder_bucketing():
    from radet_tpu.core.box_coder import build_bbox_coder

    enc, dec = build_bbox_coder(
        dict(type="BucketingBBoxCoder", num_buckets=14, scale_factor=1.7)
    )
    rng = np.random.RandomState(9)
    proposals = jnp.asarray([[0.0, 0, 40, 40], [10, 10, 80, 90]])
    gt = jnp.asarray([[2.0, -1, 38, 44], [12, 8, 76, 95]])
    offsets, w, labels, cw = enc(proposals, gt)
    assert offsets.shape == (2, 28)
    boxes, conf = dec(proposals, (np.asarray(labels) * 50.0, offsets))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(gt), atol=1e-3)
