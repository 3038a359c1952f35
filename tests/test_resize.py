"""Resize-strategy unit tests beyond the golden reference parity
(tests/test_reference_parity.py::test_eval_preprocess_parity is the
bit-exactness gate; these cover the jit path, the box-only remap helper, and
the pipeline plumbing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator
from ron_tensorflow_tpu.data.resize import (
    preprocess_for_eval,
    remap_boxes_for_eval,
    tf1_bilinear_resize,
)
from tests.test_data import _write_synthetic_dataset


def test_tf1_bilinear_jit_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    want = tf1_bilinear_resize(img, (24, 40))
    got = np.asarray(jax.jit(lambda x: tf1_bilinear_resize(x, (24, 40)))(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_tf1_bilinear_identity_when_same_shape():
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(tf1_bilinear_resize(img, (16, 16)), img)


@pytest.mark.parametrize("strategy", ["CENTRAL_CROP", "PAD_AND_RESIZE", "WARP_RESIZE", "NONE"])
@pytest.mark.parametrize("hw", [(375, 500), (240, 280), (320, 320)])
def test_remap_boxes_matches_full_preprocess(strategy, hw):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
    boxes = np.array([[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 1.0, 1.0]], np.float32)
    _, full_boxes, _ = preprocess_for_eval(img, boxes, strategy, (320, 320))
    only_boxes = remap_boxes_for_eval(boxes, hw, strategy, (320, 320))
    np.testing.assert_array_equal(only_boxes, full_boxes)


def test_pipeline_eval_resize_strategies(tmp_path):
    files = _write_synthetic_dataset(tmp_path, n=4)  # 96x128 images
    for strategy in ("WARP_RESIZE", "CENTRAL_CROP", "PAD_AND_RESIZE"):
        cfg = PipelineConfig(
            batch_size=4,
            working_shape=(64, 64),
            max_boxes=8,
            shuffle=False,
            keep_difficult=True,
            eval_resize=strategy,
        )
        b = next(iter(batch_iterator(files, cfg, epochs=1)))
        assert b["image01"].shape == (4, 64, 64, 3)
        if strategy == "WARP_RESIZE":
            # warp leaves normalized boxes unchanged
            np.testing.assert_allclose(
                b["gt_boxes"][0][b["gt_valid"][0]][0], [0.1, 0.1, 0.6, 0.7], atol=1e-6
            )
        else:
            want = remap_boxes_for_eval(
                np.array([[0.1, 0.1, 0.6, 0.7]], np.float32), (96, 128), strategy, (64, 64)
            )[0]
            np.testing.assert_allclose(b["gt_boxes"][0][b["gt_valid"][0]][0], want, atol=1e-6)


def test_pipeline_eval_resize_none_rejected(tmp_path):
    files = _write_synthetic_dataset(tmp_path, n=2)
    cfg = PipelineConfig(batch_size=2, working_shape=(64, 64), eval_resize="NONE")
    with pytest.raises(ValueError, match="NONE"):
        next(iter(batch_iterator(files, cfg, epochs=1)))


def test_pad_fill_is_whitened_zero():
    """Padding fills with the VGG mean color == 0 in whitened space, exactly
    like the reference's pad-after-whiten (ssd_vgg_preprocessing.py:375-405)."""
    img = np.full((100, 320, 3), 200, np.uint8)
    out, _, _ = preprocess_for_eval(img, np.zeros((0, 4), np.float32), "CENTRAL_CROP", (320, 320))
    assert np.all(out[:100] == 0.0) and np.all(out[-100:] == 0.0)
