"""Golden parity vs the reference implementation's ACTUAL numeric outputs.

Fixtures in tests/fixtures/reference_parity.npz were produced by executing the
reference's own TF1 graph code (anchors, joint dual-max encoder, decoder,
while-loop NMS, TP/FP matcher, precision/recall + VOC AP) under tf.compat.v1 —
see tools/make_reference_fixtures.py for provenance (file:line per op).

Assertions: integer/boolean outputs (labels, match indices→labels, TP/FP)
match EXACTLY; float outputs match bit-close (same math, different op order).
"""

import numpy as np
import pytest

from ron_tensorflow_tpu.models.ron import RON_320_SPEC
from ron_tensorflow_tpu.ops.ap import (
    average_precision_voc07,
    average_precision_voc12,
    precision_recall,
)
from ron_tensorflow_tpu.ops.decode import decode_boxes
from ron_tensorflow_tpu.ops.encode import TargetEncoder
from ron_tensorflow_tpu.ops.matching import match_detections
from ron_tensorflow_tpu.ops.nms import nms_sorted, nms_sorted_fixpoint, sort_by_score

FIXTURES = "tests/fixtures/reference_parity.npz"


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURES)


@pytest.fixture(scope="module")
def layout():
    return RON_320_SPEC.anchor_layout()


def test_anchor_parity(fx, layout):
    """Our flat anchor layout == reference ron_anchors_all_layers output
    (flattened exactly like the reference's joint encoder flattens it)."""
    ref = fx["anchors_cycxhw"]
    assert layout.cyxhw.shape == ref.shape == (21250, 4)
    np.testing.assert_allclose(layout.cyxhw, ref, atol=1e-6, rtol=0)


@pytest.mark.parametrize("case", ["e1", "e3", "e8"])
def test_encoder_parity(fx, layout, case):
    """Joint all-layer dual-max matching reproduces the reference encoder:
    labels exact (incl. -1 ignore codes), scores and location targets
    bit-close."""
    gt_labels = fx[f"enc_{case}_gt_labels"].astype(np.int32)
    gt_boxes = fx[f"enc_{case}_gt_boxes"]
    enc = TargetEncoder(layout, (320, 320), 0.56, 0.3)
    out = enc(gt_labels, gt_boxes, np.ones(gt_labels.shape, bool))

    ref_labels = fx[f"enc_{case}_labels"].astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out.labels), ref_labels)
    np.testing.assert_allclose(
        np.asarray(out.scores), fx[f"enc_{case}_scores"], atol=1e-6, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.locations), fx[f"enc_{case}_locations"], atol=1e-5, rtol=0
    )


def test_decode_parity(fx, layout):
    loc = fx["dec_locations"]  # [2, 21250, 4]
    ours = np.asarray(decode_boxes(loc, layout.cyxhw))
    np.testing.assert_allclose(ours, fx["dec_boxes"], atol=1e-5, rtol=0)


@pytest.mark.parametrize("method", ["loop", "fixpoint"])
@pytest.mark.parametrize(
    "mode,thresh,keep", [("union", 0.45, 20), ("union", 0.45, 200), ("union", 0.3, 20),
                         ("min", 0.45, 20), ("min", 0.45, 200), ("min", 0.3, 20)]
)
def test_nms_parity(fx, method, mode, thresh, keep):
    """Both NMS implementations (sequential loop and MXU fixpoint — the
    shipping default) keep EXACTLY the reference while-loop NMS's boxes,
    in the same order, zero-padded to keep_top_k."""
    scores, boxes = fx["nms_scores"], fx["nms_boxes"]
    s_sorted, b_sorted = sort_by_score(scores, boxes, scores.shape[0])
    fn = nms_sorted if method == "loop" else nms_sorted_fixpoint
    s, b = fn(s_sorted, b_sorted, nms_threshold=thresh, keep_top_k=keep, mode=mode)

    key = f"nms_{mode}_{int(thresh * 100)}_{keep}"
    ref_s, ref_b = fx[key + "_scores"], fx[key + "_boxes"]
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(b), ref_b, atol=1e-6, rtol=0)


@pytest.mark.parametrize("case", ["m1", "m2"])
def test_matching_parity(fx, case):
    """Greedy TP/FP matcher == reference bboxes_matching exactly."""
    res = match_detections(
        int(fx[f"match_{case}_label"]),
        fx[f"match_{case}_det_scores"],
        fx[f"match_{case}_det_boxes"],
        fx[f"match_{case}_glabels"].astype(np.int32),
        fx[f"match_{case}_gboxes"],
        fx[f"match_{case}_gdifficults"],
        matching_threshold=0.5,
    )
    assert int(res.n_gt) == int(fx[f"match_{case}_n_gt"])
    np.testing.assert_array_equal(np.asarray(res.tp), fx[f"match_{case}_tp"])
    np.testing.assert_array_equal(np.asarray(res.fp), fx[f"match_{case}_fp"])


@pytest.mark.parametrize("tag", ["big", "small"])
@pytest.mark.parametrize(
    "strategy", ["NONE", "CENTRAL_CROP", "PAD_AND_RESIZE", "WARP_RESIZE"]
)
def test_eval_preprocess_parity(fx, tag, strategy):
    """Whiten + resize strategy == the reference's actual preprocess_for_eval
    (ref: ssd_vgg_preprocessing.py:358-425), incl. TF1 legacy bilinear
    numerics, box remapping, and the bbox_img rectangle."""
    from ron_tensorflow_tpu.data.resize import preprocess_for_eval

    img, boxes, bbox_img = preprocess_for_eval(
        fx[f"pre_{tag}_image"], fx[f"pre_{tag}_gt_boxes"], strategy, (320, 320)
    )
    key = f"pre_{tag}_{strategy.lower()}"
    # Bit-exact: same float32 kernel arithmetic as TF1's legacy ResizeBilinear.
    np.testing.assert_array_equal(img, fx[key + "_image"])
    np.testing.assert_array_equal(boxes, fx[key + "_boxes"])
    np.testing.assert_array_equal(bbox_img, fx[key + "_bbox_img"])


@pytest.mark.parametrize("case", ["m1", "m2"])
def test_precision_recall_and_ap_parity(fx, case):
    prec, rec = precision_recall(
        int(fx[f"match_{case}_n_gt"]),
        fx[f"match_{case}_tp"],
        fx[f"match_{case}_fp"],
        fx[f"match_{case}_det_scores"],
    )
    np.testing.assert_allclose(prec, fx[f"ap_{case}_precision"], atol=1e-12, rtol=0)
    np.testing.assert_allclose(rec, fx[f"ap_{case}_recall"], atol=1e-12, rtol=0)
    assert abs(average_precision_voc07(prec, rec) - fx[f"ap_{case}_voc07"]) < 1e-12
    assert abs(average_precision_voc12(prec, rec) - fx[f"ap_{case}_voc12"]) < 1e-12
