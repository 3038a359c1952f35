"""AP / precision-recall tests with hand-computed golden values, plus a
TP/FP matcher test against Pascal VOC semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from ron_tensorflow_tpu.ops import ap
from ron_tensorflow_tpu.ops.matching import match_detections


def test_precision_recall_golden():
    # 3 detections sorted by score: TP, FP, TP; 2 gt.
    scores = np.array([0.9, 0.8, 0.7])
    tp = np.array([True, False, True])
    fp = np.array([False, True, False])
    prec, rec = ap.precision_recall(2, tp, fp, scores)
    np.testing.assert_allclose(prec, [1.0, 0.5, 2.0 / 3.0])
    np.testing.assert_allclose(rec, [0.5, 0.5, 1.0])


def test_ap_voc07_perfect():
    prec = np.ones(10)
    rec = np.linspace(0.1, 1.0, 10)
    assert ap.average_precision_voc07(prec, rec) == pytest.approx(1.0)


def test_ap_voc12_perfect():
    prec = np.ones(10)
    rec = np.linspace(0.1, 1.0, 10)
    assert ap.average_precision_voc12(prec, rec) == pytest.approx(1.0)


def test_ap_voc07_golden():
    # Precision 1.0 up to recall 0.5 then 0.5: 11-point = (6*1 + 5*0.5)/11
    prec = np.array([1.0, 0.5])
    rec = np.array([0.5, 1.0])
    expected = (6 * 1.0 + 5 * 0.5) / 11.0
    assert ap.average_precision_voc07(prec, rec) == pytest.approx(expected)


def test_ap_voc12_golden():
    prec = np.array([1.0, 0.5])
    rec = np.array([0.5, 1.0])
    # envelope: precision 1.0 on (0,0.5], 0.5 on (0.5,1.0]
    assert ap.average_precision_voc12(prec, rec) == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)


def test_match_detections_voc_semantics():
    glabels = jnp.array([3, 3, 5, 0])  # two class-3 gt, one class-5, one pad
    gboxes = jnp.array(
        [
            [0.1, 0.1, 0.4, 0.4],
            [0.6, 0.6, 0.9, 0.9],
            [0.1, 0.6, 0.4, 0.9],
            [0.0, 0.0, 0.0, 0.0],
        ]
    )
    gdiff = jnp.array([False, False, False, False])
    # Detections for class 3 (desc score): hit gt0, duplicate hit gt0, hit gt1, miss.
    boxes = jnp.array(
        [
            [0.1, 0.1, 0.4, 0.4],
            [0.12, 0.12, 0.42, 0.42],
            [0.6, 0.6, 0.9, 0.9],
            [0.7, 0.1, 0.9, 0.3],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    res = match_detections(jnp.int32(3), scores, boxes, glabels, gboxes, gdiff, 0.5)
    assert int(res.n_gt) == 2
    assert np.asarray(res.tp).tolist() == [True, False, True, False]
    assert np.asarray(res.fp).tolist() == [False, True, False, True]


def test_match_difficult_ignored():
    glabels = jnp.array([2])
    gboxes = jnp.array([[0.1, 0.1, 0.5, 0.5]])
    gdiff = jnp.array([True])
    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5]])
    scores = jnp.array([0.9])
    res = match_detections(jnp.int32(2), scores, boxes, glabels, gboxes, gdiff, 0.5)
    assert int(res.n_gt) == 0
    assert not bool(res.tp[0]) and not bool(res.fp[0])


def test_streaming_accumulator_map():
    acc = ap.StreamingTpFp(num_classes=3)
    acc.add(1, 2, np.array([0.9, 0.8]), np.array([True, True]), np.array([False, False]))
    acc.add(2, 1, np.array([0.7, 0.0]), np.array([False, False]), np.array([True, False]))
    m07, aps = acc.mean_average_precision("voc07")
    assert aps[1] == pytest.approx(1.0)
    assert aps[2] == 0.0
    assert m07 == pytest.approx(0.5)
