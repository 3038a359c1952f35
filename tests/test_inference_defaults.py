"""Coverage for the SHIPPING DetectionConfig defaults: fixpoint NMS and
approx_top_k (ref semantics: eval_ron_network.py:64-75 + tf_extended/bboxes.py
:173-234; the TPU speed knobs must not change the keep sets / ranking head).

VERDICT r1 flagged that the default inference path had zero unit-test
coverage — these tests pin it:
  - nms_sorted_fixpoint == nms_sorted on adversarial inputs (long suppression
    chains, exact score ties, keep_top_k saturation, all-overlapping).
  - Detector-level: fixpoint and loop produce identical detections.
  - approx_max_k candidate recall at RON-320 scale, and the exact-top_k
    fall-through when top_k >= num_anchors or approx_top_k=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.inference.detector import DetectionConfig, Detector
from ron_tensorflow_tpu.models.ron import DetectorOutputs
from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC
from ron_tensorflow_tpu.ops.nms import nms_sorted, nms_sorted_fixpoint, sort_by_score


def chain_boxes(n, step=0.02, size=0.1):
    """A diagonal chain: box i overlaps i±1 above 0.45 IoU but not i±2 —
    the worst case for the fixpoint (chain depth ~ n)."""
    ys = 0.05 + step * np.arange(n)
    return np.stack([ys, ys, ys + size, ys + size], axis=1).astype(np.float32)


def _run_both(scores, boxes, thr=0.45, keep=200, mode="union"):
    s_sorted, b_sorted = sort_by_score(jnp.asarray(scores), jnp.asarray(boxes), len(scores))
    a = nms_sorted(s_sorted, b_sorted, thr, keep, mode)
    b = nms_sorted_fixpoint(s_sorted, b_sorted, thr, keep, mode)
    return [np.asarray(x) for x in a], [np.asarray(x) for x in b]


@pytest.mark.parametrize("mode", ["union", "min"])
def test_fixpoint_matches_loop_long_chain(mode):
    n = 48
    boxes = chain_boxes(n)
    # Descending scores down the chain: greedy keeps every other box, so the
    # suppression chain is as deep as the input.
    scores = np.linspace(0.99, 0.4, n).astype(np.float32)
    (ls, lb), (fs, fb) = _run_both(scores, boxes, mode=mode)
    np.testing.assert_array_equal(ls, fs)
    np.testing.assert_array_equal(lb, fb)
    assert (ls > 0).sum() == n // 2  # alternating keep pattern


@pytest.mark.parametrize("mode", ["union", "min"])
def test_fixpoint_matches_loop_score_ties(mode):
    rng = np.random.default_rng(7)
    boxes = chain_boxes(24)
    scores = rng.choice(np.linspace(0.2, 0.9, 5), size=24).astype(np.float32)
    (ls, lb), (fs, fb) = _run_both(scores, boxes, mode=mode)
    np.testing.assert_array_equal(ls, fs)
    np.testing.assert_array_equal(lb, fb)


def test_fixpoint_matches_loop_cap_saturation():
    # 30 disjoint boxes (nothing suppressed), keep_top_k=8: the cap, not the
    # suppression, decides the output.
    ys = np.linspace(0.0, 0.87, 30).astype(np.float32)
    boxes = np.stack([ys, ys, ys + 0.02, ys + 0.02], axis=1)
    scores = np.random.default_rng(3).uniform(0.1, 1.0, 30).astype(np.float32)
    (ls, lb), (fs, fb) = _run_both(scores, boxes, keep=8)
    np.testing.assert_array_equal(ls, fs)
    np.testing.assert_array_equal(lb, fb)
    assert (ls > 0).sum() == 8


def test_fixpoint_matches_loop_all_overlapping():
    boxes = np.tile(np.array([[0.2, 0.2, 0.7, 0.7]], np.float32), (16, 1))
    boxes += np.random.default_rng(1).normal(0, 0.003, boxes.shape).astype(np.float32)
    scores = np.linspace(0.9, 0.1, 16).astype(np.float32)
    (ls, lb), (fs, fb) = _run_both(scores, boxes)
    np.testing.assert_array_equal(ls, fs)
    assert (ls > 0).sum() == 1


def _tiny_outputs(rng, batch=2):
    layout = RON_TINY_SPEC.anchor_layout()
    n = layout.num_anchors
    c = RON_TINY_SPEC.num_classes
    logits = jnp.asarray(rng.normal(0, 2.0, (batch, n, c)).astype(np.float32))
    preds = jax.nn.softmax(logits, axis=-1)
    obj_logits = jnp.asarray(rng.normal(0, 2.0, (batch, n, 2)).astype(np.float32))
    objness = jax.nn.softmax(obj_logits, axis=-1)[..., 1]
    locs = jnp.asarray(rng.normal(0, 0.5, (batch, n, 4)).astype(np.float32))
    return DetectorOutputs(
        predictions=preds,
        logits=logits,
        objness_pred=objness,
        objness_logits=obj_logits,
        locations=locs,
    )


class _NoModel:
    def apply(self, *a, **k):  # postprocess-only tests never call this
        raise AssertionError("model must not be called")


def _detector(**overrides):
    cfg = DetectionConfig(**overrides)
    return Detector(_NoModel(), RON_TINY_SPEC, cfg)


def test_detector_fixpoint_equals_loop():
    """The shipping default (fixpoint) produces byte-identical detections to
    the reference-oracle-tested sequential loop, end to end."""
    out = _tiny_outputs(np.random.default_rng(0))
    base = dict(approx_top_k=False, select_threshold=0.005, objectness_threshold=0.0)
    s_fix, b_fix = _detector(nms_method="fixpoint", **base).postprocess(out)
    s_loop, b_loop = _detector(nms_method="loop", **base).postprocess(out)
    np.testing.assert_array_equal(np.asarray(s_fix), np.asarray(s_loop))
    np.testing.assert_array_equal(np.asarray(b_fix), np.asarray(b_loop))
    assert (np.asarray(s_fix) > 0).sum() > 0


def test_detector_approx_fall_through_when_topk_covers_all():
    """approx_top_k=True falls through to exact top_k when top_k >= N, so the
    two configs must agree bit-exactly."""
    out = _tiny_outputs(np.random.default_rng(1))
    n = RON_TINY_SPEC.anchor_layout().num_anchors
    base = dict(top_k=n, select_threshold=0.005, objectness_threshold=0.0)
    s_a, b_a = _detector(approx_top_k=True, **base).postprocess(out)
    s_e, b_e = _detector(approx_top_k=False, **base).postprocess(out)
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_e))
    np.testing.assert_array_equal(np.asarray(b_a), np.asarray(b_e))


def test_detector_default_config_runs_and_ranks():
    """Smoke the exact shipping DetectionConfig() (exact selection + auto
    NMS — crowd-safe defaults per the round-5 crowded A/B)."""
    out = _tiny_outputs(np.random.default_rng(2))
    s, b = _detector().postprocess(out)
    s = np.asarray(s)
    assert s.shape == (2, 20, DetectionConfig().keep_top_k)
    # Per class, scores are descending with zero padding at the tail.
    flat = s.reshape(-1, s.shape[-1])
    assert all(np.all(np.diff(row[row > 0]) <= 0) for row in flat)


def _sparse_outputs(rng, batch=2, live=30):
    """Outputs where only `live` anchors per image carry real class scores —
    the regime where shared preselection must be lossless."""
    layout = RON_TINY_SPEC.anchor_layout()
    n = layout.num_anchors
    c = RON_TINY_SPEC.num_classes
    preds = np.full((batch, n, c), 0.01, np.float32)
    for b in range(batch):
        idx = rng.choice(n, size=live, replace=False)
        for i in idx:
            preds[b, i, 1 + rng.integers(c - 1)] = rng.uniform(0.3, 0.9)
    locs = rng.normal(0, 0.2, (batch, n, 4)).astype(np.float32)
    ones = jnp.ones((batch, n), jnp.float32)
    return DetectorOutputs(
        predictions=jnp.asarray(preds),
        logits=jnp.log(jnp.asarray(preds)),
        objness_pred=ones,
        objness_logits=jnp.stack([jnp.zeros_like(ones), ones], -1),
        locations=jnp.asarray(locs),
    )


def test_detector_shared_preselect_lossless_when_k_covers_live_set():
    """shared_top_k smaller than N but larger than the live candidate count
    must reproduce the full per-class scan bit-exactly."""
    out = _sparse_outputs(np.random.default_rng(3))
    base = dict(approx_top_k=False, select_threshold=0.1, objectness_threshold=0.0)
    s_full, b_full = _detector(shared_top_k=0, **base).postprocess(out)
    s_pre, b_pre = _detector(shared_top_k=48, **base).postprocess(out)
    np.testing.assert_array_equal(np.asarray(s_full), np.asarray(s_pre))
    np.testing.assert_array_equal(np.asarray(b_full), np.asarray(b_pre))
    assert (np.asarray(s_full) > 0).sum() > 0


def test_detector_pallas_nms_equals_loop():
    out = _tiny_outputs(np.random.default_rng(4))
    base = dict(approx_top_k=False, select_threshold=0.005, objectness_threshold=0.0)
    s_loop, b_loop = _detector(nms_method="loop", **base).postprocess(out)
    s_pal, b_pal = _detector(nms_method="pallas", **base).postprocess(out)
    np.testing.assert_array_equal(np.asarray(s_loop), np.asarray(s_pal))
    np.testing.assert_array_equal(np.asarray(b_loop), np.asarray(b_pal))


def test_approx_max_k_recall_at_ron320_scale():
    """Candidate recall of lax.approx_max_k vs exact top_k at the real
    RON-320 problem size (N=21250, k=200) — the basis for the default
    approx_top_k=True. jax guarantees >= recall_target (0.95 default)."""
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.uniform(0, 1, (21250,)).astype(np.float32))
    _, idx_a = jax.lax.approx_max_k(scores, 200)
    _, idx_e = jax.lax.top_k(scores, 200)
    recall = len(set(np.asarray(idx_a).tolist()) & set(np.asarray(idx_e).tolist())) / 200
    assert recall >= 0.95


def test_classwise_realtime_matches_streaming_detector():
    """RealtimeConfig.class_wise (auto-selected for SSD, which has no
    objectness branch) must reproduce the streaming Detector's per-class
    keep sets exactly — same candidate selection, same per-class NMS, just
    flattened to whole-image (scores, labels, boxes, valid)."""
    from ron_tensorflow_tpu.inference.detector import RealtimeConfig, RealtimeDetector

    out = _tiny_outputs(np.random.default_rng(7))
    c = RON_TINY_SPEC.num_classes
    common = dict(
        select_threshold=0.05,
        objectness_threshold=0.0,
        top_k=50,
        nms_threshold=0.4,
        nms_mode="min",
        min_size=0.03,
    )
    det = _detector(keep_top_k=10, nms_method="loop", approx_top_k=False, **common)
    s_det, b_det = det.postprocess(out)  # [B, C-1, 10], [B, C-1, 10, 4]
    rcfg = RealtimeConfig(
        class_wise=True, keep_per_class=10, keep_top_k=(c - 1) * 10, **common
    )
    rt = RealtimeDetector(_NoModel(), RON_TINY_SPEC, rcfg)
    s_rt, l_rt, b_rt, v_rt = rt.postprocess(out)

    s_det, b_det = np.asarray(s_det), np.asarray(b_det)
    s_rt, l_rt, b_rt, v_rt = map(np.asarray, (s_rt, l_rt, b_rt, v_rt))
    assert (v_rt.sum(axis=1) == (s_det > 0).sum(axis=(1, 2))).all()
    for b in range(s_det.shape[0]):
        for cls in range(1, c):
            det_row = s_det[b, cls - 1]
            det_scores = det_row[det_row > 0]
            det_boxes = b_det[b, cls - 1][det_row > 0]
            sel = v_rt[b] & (l_rt[b] == cls)
            np.testing.assert_array_equal(s_rt[b][sel], det_scores)
            np.testing.assert_array_equal(b_rt[b][sel], det_boxes)


def test_realtime_for_spec_selects_family_defaults():
    from ron_tensorflow_tpu.inference.detector import RealtimeConfig
    from ron_tensorflow_tpu.models.ssd import SSD_300_SPEC

    ron = RealtimeConfig.for_spec(RON_TINY_SPEC, objectness_threshold=0.9)
    assert not ron.class_wise and ron.objectness_threshold == 0.9
    assert ron.select_threshold == 0.6  # the published ron_eval.py flags
    ssd = RealtimeConfig.for_spec(SSD_300_SPEC, objectness_threshold=0.9)
    assert ssd.class_wise and ssd.objectness_threshold == 0.0
    assert ssd.select_threshold == 0.01 and ssd.nms_mode == "min"
