"""Pallas NMS kernel: interpreter-mode equivalence vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.kernels.nms_pallas import (
    nms_sorted_pallas,
    pallas_nms_fixpoint_keep_mask,
    pallas_nms_keep_mask,
)
from ron_tensorflow_tpu.ops import nms as nmsops


def random_rows(seed, r=6, n=64):
    rng = np.random.default_rng(seed)
    cy, cx = rng.uniform(0.2, 0.8, (2, r, n))
    h, w = rng.uniform(0.05, 0.4, (2, r, n))
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1).astype(np.float32)
    scores = np.where(
        rng.uniform(size=(r, n)) < 0.2, 0.0, rng.uniform(0.01, 1, (r, n))
    ).astype(np.float32)
    # sort rows descending
    order = np.argsort(-scores, axis=-1)
    scores = np.take_along_axis(scores, order, axis=-1)
    boxes = np.take_along_axis(boxes, order[..., None], axis=-2)
    return jnp.asarray(scores), jnp.asarray(boxes)


@pytest.mark.parametrize("mode", ["union", "min"])
def test_pallas_keep_mask_matches_loop(mode):
    scores, boxes = random_rows(0)
    keep = pallas_nms_keep_mask(scores, boxes, 0.45, 16, mode, interpret=True)
    for r in range(scores.shape[0]):
        s_ref, b_ref = nmsops.nms_sorted(scores[r], boxes[r], 0.45, 16, mode)
        s_p = np.asarray(scores[r])[np.asarray(keep[r])][:16]
        np.testing.assert_allclose(
            np.sort(s_p)[::-1], np.asarray(s_ref)[: len(s_p)], rtol=1e-6
        )


@pytest.mark.parametrize("method", ["scan", "fixpoint"])
def test_pallas_compaction_matches_reference(method):
    scores, boxes = random_rows(1)
    s_p, b_p = nms_sorted_pallas(
        scores, boxes, 0.45, 16, "min", interpret=True, method=method
    )
    for r in range(scores.shape[0]):
        s_ref, b_ref = nmsops.nms_sorted(scores[r], boxes[r], 0.45, 16, "min")
        np.testing.assert_allclose(np.asarray(s_p[r]), np.asarray(s_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b_p[r]), np.asarray(b_ref), rtol=1e-6)


@pytest.mark.parametrize("mode", ["union", "min"])
def test_pallas_fixpoint_long_chain_and_cap(mode):
    """Adversarial inputs for the fixpoint: a deep suppression chain (depth ~
    n) and cap saturation — must equal the sequential greedy keep set."""
    n = 48
    ys = 0.05 + 0.02 * np.arange(n)
    chain = np.stack([ys, ys, ys + 0.1, ys + 0.1], 1).astype(np.float32)
    chain_scores = np.linspace(0.99, 0.4, n).astype(np.float32)
    # disjoint boxes hitting the keep_top_k cap
    ys2 = np.linspace(0.0, 0.87, n).astype(np.float32)
    disjoint = np.stack([ys2, ys2, ys2 + 0.02, ys2 + 0.02], 1)
    dj_scores = -np.sort(-np.random.default_rng(3).uniform(0.1, 1, n)).astype(np.float32)

    scores = jnp.asarray(np.stack([chain_scores, dj_scores]))
    boxes = jnp.asarray(np.stack([chain, disjoint]))
    s_p, b_p = nms_sorted_pallas(
        scores, boxes, 0.45, 8, mode, interpret=True, method="fixpoint"
    )
    for r in range(2):
        s_ref, b_ref = nmsops.nms_sorted(scores[r], boxes[r], 0.45, 8, mode)
        np.testing.assert_array_equal(np.asarray(s_p[r]), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(b_p[r]), np.asarray(b_ref))
