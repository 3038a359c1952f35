"""Anchor generation golden tests, derived independently from the RON paper
math (centers ((i+0.5)*step)/img; h = s/img/sqrt(r), w = s/img*sqrt(r) with
anchor index = i_ratio*len(sizes)+j_size)."""

import math

import numpy as np

from ron_tensorflow_tpu.models.ron import RON_320_SPEC
from ron_tensorflow_tpu.ops import anchors


def test_ron320_anchor_count():
    layout = RON_320_SPEC.anchor_layout()
    # 10 anchors/cell over 5x5 + 10x10 + 20x20 + 40x40 grids.
    assert layout.num_anchors == 10 * (25 + 100 + 400 + 1600) == 21250
    assert layout.layer_sizes == (250, 1000, 4000, 16000)


def test_anchor_hw_order():
    h, w = anchors.anchor_heights_widths((320, 320), sizes=(224.0, 256.0), ratios=(1, 2, 3, 0.5, 1.0 / 3))
    # index = i_ratio * len(sizes) + j_size
    assert h.shape == (10,)
    np.testing.assert_allclose(h[0], 224.0 / 320.0, rtol=1e-6)
    np.testing.assert_allclose(h[1], 256.0 / 320.0, rtol=1e-6)
    np.testing.assert_allclose(h[2], 224.0 / 320.0 / math.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(w[2], 224.0 / 320.0 * math.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(h[8] * w[8], (224.0 / 320.0) ** 2, rtol=1e-6)  # area preserved


def test_anchor_centers_first_layer():
    layout = RON_320_SPEC.anchor_layout()
    # First layer is block7: 5x5 grid, step 64, offset 0.5.
    first = layout.cyxhw[:10]
    np.testing.assert_allclose(first[:, 0], (0.5 * 64) / 320.0, rtol=1e-6)
    np.testing.assert_allclose(first[:, 1], (0.5 * 64) / 320.0, rtol=1e-6)
    # 11th anchor starts the next cell in x.
    np.testing.assert_allclose(layout.cyxhw[10, 1], (1.5 * 64) / 320.0, rtol=1e-6)
    np.testing.assert_allclose(layout.cyxhw[10, 0], (0.5 * 64) / 320.0, rtol=1e-6)


def test_flat_layer_order_and_borders():
    layout = RON_320_SPEC.anchor_layout()
    # Layer order block7 -> block4; allowed borders 32,16,8,4.
    np.testing.assert_allclose(layout.allowed_borders[:250], 32.0)
    np.testing.assert_allclose(layout.allowed_borders[250:1250], 16.0)
    np.testing.assert_allclose(layout.allowed_borders[1250:5250], 8.0)
    np.testing.assert_allclose(layout.allowed_borders[5250:], 4.0)
    # Last layer cells use step 8: last anchor center at ((39+0.5)*8)/320.
    np.testing.assert_allclose(layout.cyxhw[-1, 0], (39.5 * 8) / 320.0, rtol=1e-6)


def test_corner_center_consistency():
    layout = RON_320_SPEC.anchor_layout()
    cy, cx, h, w = (layout.cyxhw[:, i] for i in range(4))
    np.testing.assert_allclose(layout.corners[:, 0], cy - h / 2, atol=1e-6)
    np.testing.assert_allclose(layout.corners[:, 3], cx + w / 2, atol=1e-6)


def test_split_layers_shapes():
    layout = RON_320_SPEC.anchor_layout()
    views = layout.split_layers(layout.cyxhw)
    assert [v.shape for v in views] == [
        (5, 5, 10, 4),
        (10, 10, 10, 4),
        (20, 20, 10, 4),
        (40, 40, 10, 4),
    ]
