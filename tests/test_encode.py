"""Encoder tests: dual-max matching semantics checked against an
independent numpy oracle implementing the documented reference behavior
(anchor→gt thresholded argmax with -1/-2 codes, gt→anchor forced override),
plus encode/decode round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.models.ron import RON_320_SPEC
from ron_tensorflow_tpu.ops.decode import decode_boxes
from ron_tensorflow_tpu.ops.encode import TargetEncoder, anchor_inside_mask, dual_max_match


def numpy_dual_max_oracle(overlap, valid, high, low):
    """Straightforward re-derivation of the matching rules, for parity."""
    g, n = overlap.shape
    a2g = overlap.argmax(axis=0)
    mv = overlap.max(axis=0)
    idx = np.where(mv < low, -1, a2g)
    idx = np.where((mv >= low) & (mv < high), -2, idx)
    # gt→anchor override: first (lowest-index) valid gt claiming each anchor wins.
    claimed = {}
    for gi in range(g):
        if not valid[gi]:
            continue
        best = overlap[gi].argmax()
        if best not in claimed:
            claimed[best] = gi
    for ai, gi in claimed.items():
        idx[ai] = gi
    scores = np.array(
        [overlap[claimed[ai], ai] if ai in claimed else mv[ai] for ai in range(n)]
    )
    return idx, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dual_max_match_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    g, n = 8, 64
    overlap = rng.uniform(0, 1, (g, n)).astype(np.float32)
    valid = np.ones((g,), bool)
    valid[6:] = False
    overlap[~valid] = 0.0
    idx, scores = dual_max_match(jnp.asarray(overlap), jnp.asarray(valid), 0.56, 0.3)
    oidx, oscores = numpy_dual_max_oracle(overlap, valid, 0.56, 0.3)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(scores), oscores, rtol=1e-6)


def test_dual_max_match_codes():
    # 2 gt, 4 anchors, hand-built: anchor0 strong match gt0; anchor1 between;
    # anchor2 below low; anchor3 is gt1's best (but low IoU -> still claimed).
    overlap = jnp.array(
        [
            [0.9, 0.4, 0.1, 0.0],
            [0.0, 0.0, 0.05, 0.2],
        ]
    )
    valid = jnp.array([True, True])
    idx, scores = dual_max_match(overlap, valid, 0.56, 0.3)
    assert list(np.asarray(idx)) == [0, -2, -1, 1]
    np.testing.assert_allclose(np.asarray(scores), [0.9, 0.4, 0.1, 0.2], rtol=1e-6)


def test_no_valid_gt_all_negative():
    overlap = jnp.zeros((4, 16))
    valid = jnp.zeros((4,), bool)
    idx, scores = dual_max_match(overlap, valid, 0.5, 0.3)
    assert np.all(np.asarray(idx) == -1)
    assert np.all(np.asarray(scores) == 0)


@pytest.fixture(scope="module")
def encoder():
    return TargetEncoder(
        RON_320_SPEC.anchor_layout(),
        RON_320_SPEC.img_shape,
        positive_threshold=0.5,
        ignore_threshold=0.3,
    )


def test_encode_positive_anchor_roundtrip(encoder):
    # A gt box placed exactly on an anchor: target must be ~0 and label set.
    layout = RON_320_SPEC.anchor_layout()
    k = 7000  # an anchor in block4's range with small size
    cy, cx, h, w = layout.cyxhw[k]
    gt_box = np.array([[cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2]], np.float32)
    labels = np.array([12])
    valid = np.array([True])
    t = encoder(jnp.asarray(labels), jnp.asarray(gt_box), jnp.asarray(valid))
    lab = np.asarray(t.labels)
    assert lab[k] == 12
    np.testing.assert_allclose(np.asarray(t.locations)[k], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.scores)[k], 1.0, rtol=1e-5)


def test_encode_decode_roundtrip(encoder, rng):
    layout = RON_320_SPEC.anchor_layout()
    # Random plausible boxes.
    cy = rng.uniform(0.3, 0.7, 5)
    cx = rng.uniform(0.3, 0.7, 5)
    h = rng.uniform(0.2, 0.4, 5)
    w = rng.uniform(0.2, 0.4, 5)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1).astype(np.float32)
    labels = np.arange(1, 6)
    valid = np.ones(5, bool)
    t = encoder(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    lab = np.asarray(t.labels)
    # Every gt claims at least one anchor.
    assert set(labels).issubset(set(lab[lab > 0]))
    # Decoding the loc targets at positive anchors returns the gt box.
    pos = np.where(lab > 0)[0]
    decoded = np.asarray(decode_boxes(t.locations, jnp.asarray(layout.cyxhw)))
    for ai in pos:
        gt_idx = labels.tolist().index(lab[ai])
        np.testing.assert_allclose(decoded[ai], boxes[gt_idx], atol=1e-4)


def test_encode_ignore_band(encoder):
    # A gt overlapping some anchors in (0.3, 0.5) must mark them -1 (ignore).
    boxes = np.array([[0.31, 0.31, 0.69, 0.62]], np.float32)
    t = encoder(jnp.asarray([3]), jnp.asarray(boxes), jnp.asarray([True]))
    lab = np.asarray(t.labels)
    assert (lab == -1).sum() > 0
    assert (lab == 3).sum() >= 1
    # ignore anchors must carry zero loc targets
    locs = np.asarray(t.locations)
    assert np.all(locs[lab == -1] == 0)


def test_inside_mask_excludes_border_anchors():
    layout = RON_320_SPEC.anchor_layout()
    inside = anchor_inside_mask(layout, (320, 320))
    # Coarse layers have big anchors extending beyond borders: some excluded.
    assert inside.sum() < layout.num_anchors
    # Centered small anchors are always inside.
    center_idx = np.argmin(
        np.abs(layout.cyxhw[:, 0] - 0.5) + np.abs(layout.cyxhw[:, 1] - 0.5)
    )
    assert inside[center_idx]


def test_batched_encode(encoder):
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[0, 0] = [0.2, 0.2, 0.8, 0.8]
    boxes[1, 0] = [0.1, 0.1, 0.4, 0.4]
    labels = np.array([[5, 0, 0], [7, 0, 0]])
    valid = np.array([[True, False, False], [True, False, False]])
    t = encoder.batched(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    assert t.labels.shape == (2, 21250)
    assert (np.asarray(t.labels)[0] == 5).sum() >= 1
    assert (np.asarray(t.labels)[1] == 7).sum() >= 1
