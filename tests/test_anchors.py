import numpy as np

from radet_tpu.core import AnchorConfig, anchor_featmap_sizes, generate_anchors


def test_featmap_sizes_480x640():
    sizes = anchor_featmap_sizes((480, 640), (8, 16, 32, 64, 128))
    assert sizes == [(60, 80), (30, 40), (15, 20), (8, 10), (4, 5)]


def test_anchor_counts_and_geometry():
    anchors, ranges, strides, counts = generate_anchors((480, 640))
    assert counts == [4800, 1200, 300, 80, 20]
    assert anchors.shape == (6400, 4)
    # level 0 (stride 8): anchor (i=0, j=0) centered at (0,0), side 64
    np.testing.assert_allclose(anchors[0], [-32, -32, 32, 32])
    # anchor (i=0, j=1): center (8, 0)
    np.testing.assert_allclose(anchors[1], [-24, -32, 40, 32])
    # anchor (i=1, j=0): center (0, 8) -> row-major, x fastest
    np.testing.assert_allclose(anchors[80], [-32, -24, 32, 40])
    # level 1 (stride 16): first anchor side 128 centered (0, 0)
    np.testing.assert_allclose(anchors[4800], [-64, -64, 64, 64])
    # last level (stride 128): side 1024
    np.testing.assert_allclose(anchors[-1], [4 * 128 - 512, 3 * 128 - 512, 4 * 128 + 512, 3 * 128 + 512])
    # regress ranges per level
    np.testing.assert_allclose(ranges[0], [-1, 64])
    np.testing.assert_allclose(ranges[4800], [64, 128])
    np.testing.assert_allclose(ranges[-1], [512, 1e8])
    assert strides[0] == 8 and strides[-1] == 128


def test_anchor_centers_inside_image():
    anchors, _, strides, _ = generate_anchors((480, 640))
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    assert cx.max() < 640 and cy.max() < 480
    assert cx.min() == 0 and cy.min() == 0
