"""Regression: evaluation must cover every image even when batch_size does
not divide the dataset size (final short batch padded + masked)."""

import numpy as np

from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator


def _shards(tmp_path, n):
    import io

    from PIL import Image

    from ron_tensorflow_tpu.data.convert import encode_voc_example
    from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
    from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject

    rng = np.random.default_rng(0)
    path = str(tmp_path / "voc_2007_test_000.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (48, 48, 3), np.uint8)).save(buf, format="JPEG")
            ann = VocAnnotation((48, 48, 3), [VocObject(1 + i % 3, "x", (0.1, 0.1, 0.8, 0.8), 0, 0)])
            w.write(encode_voc_example(buf.getvalue(), ann))
    return [path]


def test_partial_batch_padded_and_masked(tmp_path):
    files = _shards(tmp_path, 10)
    cfg = PipelineConfig(batch_size=4, working_shape=(32, 32), max_boxes=4, shuffle=False)
    batches = list(batch_iterator(files, cfg, epochs=1, drop_remainder=False))
    assert len(batches) == 3  # 4 + 4 + 2(padded to 4)
    last = batches[-1]
    assert last["image01"].shape[0] == 4
    assert last["sample_valid"].tolist() == [True, True, False, False]
    # padded rows carry no gt
    assert not last["gt_valid"][2:].any()
    total_real = sum(b["sample_valid"].sum() for b in batches)
    assert total_real == 10


def test_streaming_eval_counts_every_image(tmp_path):
    import jax
    import jax.numpy as jnp

    from ron_tensorflow_tpu.data.preprocess import whiten
    from ron_tensorflow_tpu.eval import StreamingEvaluator
    from ron_tensorflow_tpu.inference.detector import DetectionConfig
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    files = _shards(tmp_path, 5)
    model = RON(spec=RON_TINY_SPEC)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ev = StreamingEvaluator(model, RON_TINY_SPEC, DetectionConfig(top_k=32, keep_top_k=8))

    cfg = PipelineConfig(batch_size=4, working_shape=(64, 64), max_boxes=4,
                         shuffle=False, keep_difficult=True)

    def eval_batches():
        for hb in batch_iterator(files, cfg, epochs=1, drop_remainder=False):
            yield {
                "image": np.asarray(whiten(hb["image01"])),
                "gt_labels": hb["gt_labels"],
                "gt_boxes": hb["gt_boxes"],
                "gt_difficult": hb["gt_difficult"],
                "sample_valid": hb["sample_valid"],
            }

    _, _, _, stats = ev.run(variables, eval_batches(), log_every=0)
    assert stats["images"] == 5  # not 4: the short batch is padded, not dropped
