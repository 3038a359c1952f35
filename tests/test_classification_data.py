"""Classification dataset schema tests (D8 parity)."""

import numpy as np

from ron_tensorflow_tpu.data.classification import (
    CLASSIFICATION_SPLITS,
    encode_classification_example,
    parse_classification_example,
)


def test_split_registry():
    assert CLASSIFICATION_SPLITS["cifar10"]["train"].num_samples == 50000
    assert CLASSIFICATION_SPLITS["imagenet"]["validation"].num_samples == 50000


def test_example_roundtrip():
    rec = encode_classification_example(b"\xff\xd8jpeg", 42)
    out = parse_classification_example(rec)
    assert out["jpeg"] == b"\xff\xd8jpeg"
    assert out["label"] == 42
    assert isinstance(out["label"], np.int32)
