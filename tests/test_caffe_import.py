"""Caffe importer test: hand-encode a tiny caffemodel proto, parse it back."""

import numpy as np

from ron_tensorflow_tpu.data.example import _len_delimited, _tag, _varint
from ron_tensorflow_tpu.train.caffe_import import caffe_vgg_to_flat, parse_caffemodel


def encode_blob(arr: np.ndarray) -> bytes:
    # BlobShape (field 7): packed dims (field 1)
    dims = b"".join(_varint(d) for d in arr.shape)
    shape_msg = _len_delimited(1, dims)
    blob = _len_delimited(7, shape_msg)
    blob += _len_delimited(5, arr.astype("<f4").tobytes())  # data field 5 packed
    return blob


def encode_layer(name: str, ltype: str, blobs) -> bytes:
    msg = _len_delimited(1, name.encode())
    msg += _len_delimited(2, ltype.encode())
    for b in blobs:
        msg += _len_delimited(7, encode_blob(b))
    return _len_delimited(100, msg)  # NetParameter.layer = 100


def test_parse_caffemodel_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.normal(size=(64,)).astype(np.float32)
    gamma = np.full((512,), 20.0, np.float32)
    net = encode_layer("conv1_1", "Convolution", [w, b])
    net += encode_layer("conv4_3_norm", "Normalize", [gamma])
    path = tmp_path / "model.caffemodel"
    path.write_bytes(net)

    layers = parse_caffemodel(str(path))
    assert set(layers) == {"conv1_1", "conv4_3_norm"}
    ltype, blobs = layers["conv1_1"]
    assert ltype == "Convolution"
    np.testing.assert_allclose(blobs[0], w)
    np.testing.assert_allclose(blobs[1], b)

    flat = caffe_vgg_to_flat(layers, bgr_to_rgb=True)
    k = flat["backbone/conv1_1/conv/kernel"]
    assert k.shape == (3, 3, 3, 64)
    # BGR flip applied to input channels of the first conv
    np.testing.assert_allclose(k[..., 0, :], np.transpose(w, (2, 3, 1, 0))[..., 2, :])
    np.testing.assert_allclose(flat["conv4_3_norm/l2_norm/gamma"], 20.0)
