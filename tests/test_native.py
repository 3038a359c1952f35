"""Native data-path helpers: C crc32c/scan parity vs the pure-python
implementations, corruption detection, and the no-compiler fallback."""

import io
import os

import numpy as np
import pytest

from ron_tensorflow_tpu.data import native, tfrecord


def python_crc32c(data: bytes) -> int:
    table = tfrecord._crc_table()
    crc = np.uint64(0xFFFFFFFF)
    for b in np.frombuffer(data, dtype=np.uint8).tolist():
        crc = table[(int(crc) ^ b) & 0xFF] ^ (crc >> np.uint64(8))
    return int(crc) ^ 0xFFFFFFFF


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no system compiler available")
    return lib


def test_crc32c_matches_python_table(lib):
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 63, 64, 1000, 65537):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        assert native.crc32c(data) == python_crc32c(data), n
    # known vector: crc32c("123456789") = 0xE3069283
    assert native.crc32c(b"123456789") == 0xE3069283


def test_scan_records_roundtrip(lib, tmp_path):
    path = str(tmp_path / "x.tfrecord")
    payloads = [os.urandom(n) for n in (1, 100, 5000, 0, 77)]
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(tfrecord.read_records(path)) == payloads
    # native scan agrees with the python streaming reader
    with open(path, "rb") as f:
        buf = f.read()
    offsets, lengths = native.scan_records(buf)
    assert [buf[o : o + l] for o, l in zip(offsets, lengths)] == payloads


def test_scan_detects_corruption(lib, tmp_path):
    path = str(tmp_path / "y.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(b"hello world" * 10)
        w.write(b"second record")
    data = bytearray(open(path, "rb").read())
    data[20] ^= 0xFF  # flip a payload byte of record 0
    with pytest.raises(IOError):
        native.scan_records(bytes(data))
    # truncation is corruption too
    with pytest.raises(IOError):
        native.scan_records(bytes(data[:-2]))


def test_reader_fallback_without_native(tmp_path, monkeypatch):
    path = str(tmp_path / "z.tfrecord")
    payloads = [b"a" * 10, b"bb" * 20]
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    assert list(tfrecord.read_records(path, verify_crc=True)) == payloads
    assert native.crc32c(b"xyz") is None  # graceful None without the lib


def test_writer_crc_is_tfrecord_compatible(lib, tmp_path):
    """The framing must stay byte-compatible with TF's writer (mask + crc)."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tfw.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(b"payload-1")
        w.write(b"payload-two")
    ours = str(tmp_path / "ours.tfrecord")
    with tfrecord.TFRecordWriter(ours) as w:
        w.write(b"payload-1")
        w.write(b"payload-two")
    assert open(path, "rb").read() == open(ours, "rb").read()
    # and the native scanner verifies TF-written files
    buf = open(path, "rb").read()
    offsets, lengths = native.scan_records(buf)
    assert [buf[o : o + l] for o, l in zip(offsets, lengths)] == [
        b"payload-1",
        b"payload-two",
    ]
