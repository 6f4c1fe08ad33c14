import jax.numpy as jnp
import numpy as np

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
