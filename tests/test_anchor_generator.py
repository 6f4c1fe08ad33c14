"""Anchor generator family: exact values vs the reference semantics.

Expected tensors come from the reference's own executable docstring examples
(/root/reference/radet/core/anchor/anchor_generator.py:39-55,511-520) and
from independent numpy oracles of the documented formulas — labeled semantic
transcriptions, not code copies.
"""

import numpy as np
import pytest

from radet_tpu.core.anchor_generator import (
    AnchorGenerator,
    LegacyAnchorGenerator,
    PointGenerator,
    SSDAnchorGenerator,
    YOLOAnchorGenerator,
    build_anchor_generator,
    flat_anchors_for_input,
)
from radet_tpu.core.anchors import generate_anchors


def test_docstring_example_single_level():
    # reference anchor_generator.py:41-47
    gen = AnchorGenerator([16], [1.0], scales=[1.0], base_sizes=[9])
    [anchors] = gen.grid_anchors([(2, 2)])
    expected = np.array(
        [
            [-4.5, -4.5, 4.5, 4.5],
            [11.5, -4.5, 20.5, 4.5],
            [-4.5, 11.5, 4.5, 20.5],
            [11.5, 11.5, 20.5, 20.5],
        ],
        np.float32,
    )
    np.testing.assert_allclose(anchors, expected)


def test_docstring_example_two_levels():
    # reference anchor_generator.py:48-55
    gen = AnchorGenerator([16, 32], [1.0], scales=[1.0], base_sizes=[9, 18])
    a0, a1 = gen.grid_anchors([(2, 2), (1, 1)])
    np.testing.assert_allclose(a1, np.array([[-9.0, -9.0, 9.0, 9.0]], np.float32))
    assert a0.shape == (4, 4)


def test_retina_octave_base_anchors():
    # RetinaNet default: 3 octave scales x 3 ratios = 9 anchors/cell
    gen = AnchorGenerator(
        strides=[8, 16, 32, 64, 128],
        ratios=[0.5, 1.0, 2.0],
        octave_base_scale=4,
        scales_per_octave=3,
    )
    assert gen.num_base_anchors == [9] * 5
    base = gen.base_anchors[0]  # stride 8 level
    # scale-major ordering: ratio-major rows, scales fastest (reference
    # :170-172); ratio r -> h_ratio=sqrt(r), w=base*scale/sqrt(r)
    scales = 4 * 2 ** (np.arange(3) / 3)
    k = 0
    for r in (0.5, 1.0, 2.0):
        for s in scales:
            w = 8 * s / np.sqrt(r)
            h = 8 * s * np.sqrt(r)
            np.testing.assert_allclose(
                base[k], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-6
            )
            k += 1


def test_atss_config_matches_radet_anchor_module():
    # octave_base_scale 8, scales_per_octave 1, ratios [1.0] is exactly the
    # RADet configuration — the two generators must agree bit-for-bit
    gen = AnchorGenerator(
        strides=[8, 16, 32, 64, 128],
        ratios=[1.0],
        octave_base_scale=8,
        scales_per_octave=1,
    )
    flat, valid, counts = flat_anchors_for_input(gen, (480, 640))
    ref_anchors, _, _, ref_counts = generate_anchors((480, 640))
    assert counts == ref_counts
    np.testing.assert_allclose(flat, ref_anchors)
    assert valid.all()


def test_valid_flags_partial_pad():
    gen = AnchorGenerator([16], [0.5, 1.0], scales=[1.0])
    # featmap 4x4 but image pads only 3 cells wide
    [flags] = gen.valid_flags([(4, 4)], (64, 40))
    flags = flags.reshape(4, 4, 2)
    assert flags[:, :3].all() and not flags[:, 3:].any()


def test_ssd300_voc_sizes():
    gen = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.2, 0.9),
        input_size=300,
    )
    # the published SSD300-VOC min sizes
    assert gen.base_sizes == [30, 60, 111, 162, 213, 264]
    # 1 + 1(sqrt scale) + 2 per extra ratio
    assert gen.num_base_anchors == [4, 6, 6, 6, 4, 4]
    # exact slot values verified by executing the reference index-reorder
    # math ([0, A, 1, 2, ...] over scale-major rows, :450-453) with torch:
    # slot 1 lands on the (ratio 1/2, scale sqrt2) = 60x30 anchor — mmdet
    # v2.x's actual (quirky) SSD set, which is the spec here
    base = gen.base_anchors[0]
    c = 8 / 2.0
    np.testing.assert_allclose(base[0], [c - 15, c - 15, c + 15, c + 15])
    np.testing.assert_allclose(base[1], [c - 30, c - 15, c + 30, c + 15], rtol=1e-6)
    s = 30 * np.sqrt(2) / 2
    np.testing.assert_allclose(base[2], [c - s, c - s, c + s, c + s], rtol=1e-6)
    np.testing.assert_allclose(
        base[3], [c - s, c - s / 2, c + s, c + s / 2], rtol=1e-6
    )


def test_ssd300_coco_sizes():
    gen = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.15, 0.9),
        input_size=300,
    )
    assert gen.base_sizes == [21, 45, 99, 153, 207, 261]


def test_ssd_rejects_bad_ratio_range():
    with pytest.raises(ValueError):
        SSDAnchorGenerator(
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2]] * 6,
            basesize_ratio_range=(0.3, 0.9),
            input_size=300,
        )


def test_legacy_docstring_example():
    # reference anchor_generator.py:511-520
    gen = LegacyAnchorGenerator(
        [16], [1.0], scales=[1.0], base_sizes=[9], center_offset=0.5
    )
    [anchors] = gen.grid_anchors([(2, 2)])
    expected = np.array(
        [[0, 0, 8, 8], [16, 0, 24, 8], [0, 16, 8, 24], [16, 16, 24, 24]],
        np.float32,
    )
    np.testing.assert_allclose(anchors, expected)


def test_yolo_generator_and_responsible_flags():
    base_sizes = [
        [(116, 90), (156, 198), (373, 326)],
        [(30, 61), (62, 45), (59, 119)],
        [(10, 13), (16, 30), (33, 23)],
    ]
    gen = YOLOAnchorGenerator(strides=[32, 16, 8], base_sizes=base_sizes)
    assert gen.num_levels == 3
    assert gen.num_base_anchors == [3, 3, 3]
    # base anchor centered at stride/2
    np.testing.assert_allclose(
        gen.base_anchors[0][0], [16 - 58, 16 - 45, 16 + 58, 16 + 45]
    )
    # responsible flags: GT centered at (40, 40) -> cell (1,1) of the
    # stride-32 level (featmap 4x4): flat cell 5, anchors 15..17
    flags = gen.responsible_flags([(4, 4), (8, 8), (16, 16)], [[30, 30, 50, 50]])
    f0 = flags[0].reshape(16, 3)
    assert f0[5].all() and f0.sum() == 3
    f2 = flags[2].reshape(256, 3)  # stride 8: cell (5,5) -> 85
    assert f2[85].all() and f2.sum() == 3


def test_point_generator():
    pts = PointGenerator.grid_points((2, 3), stride=16.0)
    np.testing.assert_allclose(pts[:, 2], 16.0)
    np.testing.assert_allclose(pts[1], [16, 0, 16])
    np.testing.assert_allclose(pts[3], [0, 16, 16])
    valid = PointGenerator.valid_flags((2, 3), (2, 2))
    np.testing.assert_array_equal(valid.reshape(2, 3)[:, :2], True)
    assert not valid.reshape(2, 3)[:, 2].any()


def test_build_anchor_generator_dispatch():
    gen = build_anchor_generator(
        dict(
            type="AnchorGenerator",
            strides=[8, 16, 32, 64, 128],
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
        )
    )
    assert isinstance(gen, AnchorGenerator)
    with pytest.raises(KeyError):
        build_anchor_generator(dict(type="NopeGenerator"))


def test_anchor_ordering_matches_head_reshape():
    """The flat anchor order must match (B, H, W, A*4) -> (B, H*W*A, 4):
    A fastest within a cell, x fastest across cells."""
    gen = AnchorGenerator([16], [0.5, 2.0], scales=[1.0])
    [anchors] = gen.grid_anchors([(2, 2)])
    # rows 0..1 = the 2 base anchors at cell (0,0); rows 2..3 at cell (0,1)
    np.testing.assert_allclose(anchors[:2, 0] + anchors[:2, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(anchors[2:4, 0] + anchors[2:4, 2], 32.0, atol=1e-5)
