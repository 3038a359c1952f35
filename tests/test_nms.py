"""NMS tests against a plain-python greedy oracle (the reference algorithm:
take highest-score alive box, keep it, suppress overlaps >= threshold)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.ops import nms


def python_greedy_nms(scores, boxes, thr, keep_top_k, mode):
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(scores), bool)
    kept = []
    for i in order:
        if not alive[i] or scores[i] <= 0 or len(kept) >= keep_top_k:
            continue
        kept.append(i)
        for j in range(len(scores)):
            if not alive[j]:
                continue
            ymin = max(boxes[i, 0], boxes[j, 0])
            xmin = max(boxes[i, 1], boxes[j, 1])
            ymax = min(boxes[i, 2], boxes[j, 2])
            xmax = min(boxes[i, 3], boxes[j, 3])
            inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
            va = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            vb = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            denom = va + vb - inter if mode == "union" else min(va, vb)
            ov = inter / denom if denom > 0 else 0.0
            if ov >= thr:
                alive[j] = False
    return kept


@pytest.mark.parametrize("mode", ["union", "min"])
@pytest.mark.parametrize("seed", [0, 1])
def test_nms_vs_oracle(mode, seed):
    rng = np.random.default_rng(seed)
    n = 64
    cy, cx = rng.uniform(0.2, 0.8, (2, n))
    h, w = rng.uniform(0.05, 0.3, (2, n))
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    out_s, out_b = nms.nms(jnp.asarray(scores), jnp.asarray(boxes), 0.45, top_k=n, keep_top_k=10, mode=mode)
    kept = python_greedy_nms(scores, boxes, 0.45, 10, mode)
    exp_scores = sorted(scores[kept], reverse=True)
    got = np.asarray(out_s)
    np.testing.assert_allclose(got[: len(kept)], exp_scores, rtol=1e-6)
    assert np.all(got[len(kept):] == 0)
    # Boxes come back aligned with their scores.
    for r, i in enumerate(np.argsort(-scores[kept], kind="stable")):
        np.testing.assert_allclose(np.asarray(out_b)[r], boxes[kept[i]], rtol=1e-6)


def test_nms_identical_boxes_keeps_one():
    boxes = jnp.tile(jnp.array([[0.2, 0.2, 0.6, 0.6]]), (5, 1))
    scores = jnp.array([0.9, 0.8, 0.7, 0.6, 0.5])
    s, b = nms.nms(scores, boxes, 0.5, top_k=5, keep_top_k=5, mode="union")
    got = np.asarray(s)
    assert got[0] == pytest.approx(0.9)
    assert np.all(got[1:] == 0)


def test_nms_per_class_shapes():
    c, k = 20, 32
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 1, (c, k, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 0.1
    scores = rng.uniform(0, 1, (c, k)).astype(np.float32)
    s, b = nms.nms_per_class(jnp.asarray(scores), jnp.asarray(boxes), 0.5, keep_top_k=8)
    assert s.shape == (c, 8) and b.shape == (c, 8, 4)


def test_nms_with_labels_gating():
    boxes = jnp.array(
        [[0.1, 0.1, 0.4, 0.4], [0.11, 0.11, 0.41, 0.41], [0.6, 0.6, 0.9, 0.9]]
    )
    scores = jnp.array([0.9, 0.85, 0.8])
    labels = jnp.array([3, 3, 7])
    valid = jnp.array([True, True, False])  # third gated out (e.g. objectness)
    s, l, b, v = nms.nms_with_labels(scores, labels, boxes, valid, 0.5, keep_top_k=3, mode="union")
    got_v = np.asarray(v)
    assert got_v.tolist() == [True, False, False]
    assert np.asarray(l)[0] == 3
    assert np.asarray(s)[0] == pytest.approx(0.9)
