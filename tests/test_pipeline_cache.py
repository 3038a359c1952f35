"""Decode-cache behavior: the content-hash cache must eliminate repeat JPEG
decodes across epochs while leaving the (shuffled) sample stream unchanged."""

import io

import numpy as np

from ron_tensorflow_tpu.data import pipeline
from ron_tensorflow_tpu.data.convert import encode_voc_example
from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator
from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject


def _write_shard(tmp_path, n=6):
    from PIL import Image

    rng = np.random.default_rng(3)
    path = str(tmp_path / "cache_train_000.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(n):
            arr = rng.integers(0, 255, (48, 48, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ann = VocAnnotation(
                shape=(48, 48, 3),
                objects=[VocObject(1 + i % 3, "x", (0.1, 0.1, 0.8, 0.8), 0, 0)],
            )
            w.write(encode_voc_example(buf.getvalue(), ann))
    return [path]


def test_decode_cache_with_shuffle(tmp_path, monkeypatch):
    files = _write_shard(tmp_path, n=6)
    calls = {"n": 0}
    real = pipeline.decode_jpeg

    def counting(data, out_hw):
        calls["n"] += 1
        return real(data, out_hw)

    monkeypatch.setattr(pipeline, "decode_jpeg", counting)

    def run(cache):
        calls["n"] = 0
        cfg = PipelineConfig(
            batch_size=3, working_shape=(32, 32), max_boxes=4,
            shuffle=True, shuffle_buffer=4, seed=7, cache_decoded=cache,
        )
        batches = list(batch_iterator(files, cfg, epochs=2))
        imgs = np.concatenate([b["image01"] for b in batches])
        labs = np.concatenate([b["gt_labels"] for b in batches])
        return imgs, labs, calls["n"]

    imgs_c, labs_c, n_cached = run(cache=True)
    imgs_u, labs_u, n_uncached = run(cache=False)

    # cache: 6 unique images decoded once; uncached: every epoch re-decodes
    assert n_cached == 6
    assert n_uncached == 12
    # identical stream either way (same seed -> same shuffle order)
    np.testing.assert_array_equal(imgs_c, imgs_u)
    np.testing.assert_array_equal(labs_c, labs_u)
    # shuffle actually permutes across epochs
    assert imgs_c.shape[0] == 12
    assert not all(
        np.array_equal(imgs_c[i], imgs_c[i + 6]) for i in range(6)
    )
