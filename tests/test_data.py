"""Data layer tests: proto/TFRecord codec round-trips (including
byte-compatibility against TensorFlow's parser when available), VOC XML
parsing, pipeline batching, and augmentation invariants."""

import os

import numpy as np
import pytest

from ron_tensorflow_tpu.data import example as pb
from ron_tensorflow_tpu.data import tfrecord
from ron_tensorflow_tpu.data.convert import encode_voc_example
from ron_tensorflow_tpu.data.pipeline import (
    PipelineConfig,
    PrefetchIterator,
    batch_iterator,
    parse_voc_example,
)
from ron_tensorflow_tpu.data.voc import VOC_LABELS, VocAnnotation, VocObject, parse_annotation


def _sample_example():
    feats = {
        "image/encoded": pb.bytes_feature(b"\xff\xd8jpegdata"),
        "image/height": pb.int64_feature(375),
        "image/object/bbox/ymin": pb.float_feature([0.1, 0.5]),
        "image/object/bbox/label": pb.int64_feature([7, 12]),
        "image/object/bbox/label_text": pb.bytes_feature([b"car", b"dog"]),
    }
    return pb.encode_example(feats)


def test_example_roundtrip():
    buf = _sample_example()
    out = pb.decode_example(buf)
    assert out["image/encoded"] == [b"\xff\xd8jpegdata"]
    assert out["image/height"] == [375]
    np.testing.assert_allclose(out["image/object/bbox/ymin"], [0.1, 0.5], rtol=1e-6)
    assert out["image/object/bbox/label"] == [7, 12]
    assert out["image/object/bbox/label_text"] == [b"car", b"dog"]


def test_example_tf_compat():
    """Our hand-rolled wire format must parse with TensorFlow itself."""
    tf = pytest.importorskip("tensorflow")
    buf = _sample_example()
    ex = tf.train.Example()
    ex.ParseFromString(buf)
    f = ex.features.feature
    assert f["image/height"].int64_list.value[0] == 375
    np.testing.assert_allclose(
        list(f["image/object/bbox/ymin"].float_list.value), [0.1, 0.5], rtol=1e-6
    )
    # And the reverse: TF-serialized bytes decode with our parser.
    out = pb.decode_example(ex.SerializeToString())
    assert out["image/object/bbox/label"] == [7, 12]


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    payloads = [b"alpha", b"bravo" * 100, b""]
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    got = list(tfrecord.read_records(path, verify_crc=True))
    assert got == payloads


def test_tfrecord_tf_compat(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "t.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(b"hello tfrecord")
    ds = tf.data.TFRecordDataset([path])
    vals = [v.numpy() for v in ds]
    assert vals == [b"hello tfrecord"]


def test_worker_sharding():
    files = [f"f{i}" for i in range(10)]
    shards = [tfrecord.shard_for_worker(files, 3, i) for i in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert sorted(sum(shards, [])) == files


def test_voc_xml_parse(tmp_path):
    xml = """<annotation><size><width>500</width><height>375</height><depth>3</depth></size>
    <object><name>dog</name><difficult>1</difficult><truncated>0</truncated>
      <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox></object>
    <object><name>person</name>
      <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>198</ymax></bndbox></object>
    </annotation>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    ann = parse_annotation(str(p))
    assert ann.shape == (375, 500, 3)
    assert len(ann.objects) == 2
    assert ann.objects[0].label == VOC_LABELS["dog"][0]
    assert ann.objects[0].difficult == 1
    assert ann.objects[1].difficult == 0  # missing tag defaults to 0
    np.testing.assert_allclose(ann.objects[0].bbox, (240 / 375, 48 / 500, 371 / 375, 195 / 500))


def _write_synthetic_dataset(tmp_path, n=10):
    """Synthetic VOC-schema shards with real JPEGs."""
    from PIL import Image
    import io as _io

    rng = np.random.default_rng(0)
    path = str(tmp_path / "voc_2007_train_000.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for i in range(n):
            arr = rng.integers(0, 255, (96, 128, 3), np.uint8)
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ann = VocAnnotation(
                shape=(96, 128, 3),
                objects=[
                    VocObject(
                        label=1 + (i % 20),
                        label_text="x",
                        bbox=(0.1, 0.1, 0.6, 0.7),
                        difficult=i % 2,
                        truncated=0,
                    ),
                    VocObject(
                        label=1 + ((i + 5) % 20),
                        label_text="y",
                        bbox=(0.3, 0.4, 0.9, 0.95),
                        difficult=0,
                        truncated=0,
                    ),
                ],
            )
            w.write(encode_voc_example(buf.getvalue(), ann))
    return [path]


def test_pipeline_batches(tmp_path):
    files = _write_synthetic_dataset(tmp_path, n=10)
    cfg = PipelineConfig(batch_size=4, working_shape=(64, 64), max_boxes=8, shuffle=False)
    batches = list(batch_iterator(files, cfg, epochs=1))
    assert len(batches) == 2  # 10 samples -> 2 full batches of 4
    b = batches[0]
    assert b["image01"].shape == (4, 64, 64, 3)
    assert b["image01"].dtype == np.float32
    assert 0.0 <= b["image01"].min() and b["image01"].max() <= 1.0
    assert b["gt_labels"].shape == (4, 8)
    # difficult filtering: odd samples had one difficult object dropped
    assert b["gt_valid"][1].sum() == 1
    assert b["gt_valid"][0].sum() == 2


def test_prefetch_iterator(tmp_path):
    files = _write_synthetic_dataset(tmp_path, n=8)
    cfg = PipelineConfig(batch_size=4, working_shape=(32, 32), max_boxes=4, shuffle=False)
    it = PrefetchIterator(batch_iterator(files, cfg, epochs=1), depth=2)
    batches = list(it)
    assert len(batches) == 2


def test_parse_voc_example_roundtrip(tmp_path):
    files = _write_synthetic_dataset(tmp_path, n=1)
    rec = next(tfrecord.read_records(files[0]))
    s = parse_voc_example(rec)
    assert s["labels"].tolist() == [1, 6]
    assert s["boxes"].shape == (2, 4)
    assert s["difficult"].tolist() == [0, 0]
    assert s["jpeg"][:2] == b"\xff\xd8"


def test_decode_workers_parity(tmp_path):
    """Thread-pooled decode must be bit-identical and order-preserving vs
    serial (decode_workers=1)."""
    files = _write_synthetic_dataset(tmp_path, n=9)
    base = dict(batch_size=4, working_shape=(64, 64), max_boxes=8, shuffle=False)
    serial = list(
        batch_iterator(files, PipelineConfig(**base, decode_workers=1), epochs=1,
                       drop_remainder=False)
    )
    pooled = list(
        batch_iterator(files, PipelineConfig(**base, decode_workers=4), epochs=1,
                       drop_remainder=False)
    )
    assert len(serial) == len(pooled) == 3  # 9 samples -> 2 full + 1 padded
    for a, b in zip(serial, pooled):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
