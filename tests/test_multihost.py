"""Multi-host helpers (single-process simulation) and pipeline cache test."""

import numpy as np

from ron_tensorflow_tpu.parallel import make_mesh
from ron_tensorflow_tpu.parallel.multihost import host_local_to_global, process_info


def test_process_info_single():
    idx, count = process_info()
    assert idx == 0 and count == 1


def test_host_local_to_global_single_process():
    mesh = make_mesh((8, 1))
    batch = {
        "image": np.ones((8, 4, 4, 3), np.float32),
        "labels": np.arange(8 * 2, dtype=np.int32).reshape(8, 2),
    }
    g = host_local_to_global(batch, mesh)
    assert g["image"].shape == (8, 4, 4, 3)
    assert g["labels"].sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(g["labels"]), batch["labels"])


def test_pipeline_cache_roundtrip(tmp_path):
    import io

    from PIL import Image

    from ron_tensorflow_tpu.data.convert import encode_voc_example
    from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator
    from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
    from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject

    rng = np.random.default_rng(0)
    path = str(tmp_path / "voc_2007_train_000.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(4):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(buf, format="JPEG")
            ann = VocAnnotation((64, 64, 3), [VocObject(1, "x", (0.1, 0.1, 0.8, 0.8), 0, 0)])
            w.write(encode_voc_example(buf.getvalue(), ann))

    cfg = PipelineConfig(batch_size=4, working_shape=(32, 32), max_boxes=4,
                         shuffle=False, cache_decoded=True)
    batches = list(batch_iterator([path], cfg, epochs=2))
    assert len(batches) == 2
    # epoch 2 served from cache must match epoch 1 within uint8 quantization
    np.testing.assert_allclose(batches[0]["image01"], batches[1]["image01"], atol=1 / 255.0 + 1e-6)
