"""Unit tests for core box geometry against hand-computed golden values."""

import jax.numpy as jnp
import numpy as np

from ron_tensorflow_tpu.ops import boxes


def test_areas():
    b = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.25, 0.25, 0.75, 0.5]])
    np.testing.assert_allclose(boxes.areas(b), [1.0, 0.125], atol=1e-7)


def test_iou_matrix_golden():
    a = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.25, 0.25, 0.75, 0.75], [0.5, 0.5, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
    m = np.asarray(boxes.iou_matrix(a, b))
    # a0 vs b0: inter 0.0625, union 0.25 + 0.25 - 0.0625
    np.testing.assert_allclose(m[0, 0], 0.0625 / 0.4375, rtol=1e-6)
    # a0 vs b1: zero-area touch point
    np.testing.assert_allclose(m[0, 1], 0.0, atol=1e-7)
    # a1 vs b1: inter 0.25 / union 1.0
    np.testing.assert_allclose(m[1, 1], 0.25, rtol=1e-6)
    # degenerate box -> 0, not NaN
    np.testing.assert_allclose(m[:, 2], 0.0, atol=1e-7)


def test_iou_degenerate_no_nan():
    z = jnp.zeros((3, 4))
    m = np.asarray(boxes.iou_matrix(z, z))
    assert np.all(np.isfinite(m)) and np.all(m == 0)


def test_clip_collapses_disjoint():
    b = jnp.array([[-0.5, -0.5, -0.1, -0.1], [0.2, 0.2, 1.5, 0.9]])
    c = np.asarray(boxes.clip_to_ref(b))
    # Disjoint box collapses to an empty box (ymin==ymax at clip boundary).
    assert c[0, 0] == c[0, 2] and c[0, 1] == c[0, 3]
    np.testing.assert_allclose(c[1], [0.2, 0.2, 1.0, 0.9], atol=1e-7)


def test_resize_to_ref_roundtrip():
    ref = jnp.array([0.2, 0.1, 0.8, 0.9])
    b = jnp.array([[0.2, 0.1, 0.8, 0.9], [0.3, 0.3, 0.5, 0.5]])
    r = np.asarray(boxes.resize_to_ref(ref, b))
    np.testing.assert_allclose(r[0], [0.0, 0.0, 1.0, 1.0], atol=1e-6)
    # center-ish box maps proportionally
    np.testing.assert_allclose(r[1], [(0.3 - 0.2) / 0.6, (0.3 - 0.1) / 0.8, (0.5 - 0.2) / 0.6, (0.5 - 0.1) / 0.8], atol=1e-6)


def test_flip_left_right_involution():
    b = jnp.array([[0.1, 0.2, 0.5, 0.7]])
    f = boxes.flip_left_right(b)
    np.testing.assert_allclose(np.asarray(f), [[0.1, 0.3, 0.5, 0.8]], atol=1e-7)
    np.testing.assert_allclose(np.asarray(boxes.flip_left_right(f)), np.asarray(b), atol=1e-7)


def test_center_corner_roundtrip(rng):
    c = rng.uniform(0.1, 0.9, size=(10, 4)).astype(np.float32)
    back = boxes.corner_to_center(boxes.center_to_corner(jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(back), c, atol=1e-6)


def test_min_size_mask():
    b = jnp.array([[0.0, 0.0, 0.02, 0.5], [0.0, 0.0, 0.5, 0.5]])
    m = np.asarray(boxes.min_size_mask(b, 0.03))
    assert list(m) == [False, True]


def test_filter_overlap_keeps_best():
    # All below threshold: the best valid one must still be kept.
    b = jnp.array([[2.0, 2.0, 3.0, 3.0], [0.9, 0.9, 1.5, 1.5], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.array([True, True, False])
    m = np.asarray(boxes.filter_overlap_mask(b, valid, threshold=0.5))
    assert list(m) == [False, True, False]
