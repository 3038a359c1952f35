"""TF V2 bundle reader test: write a checkpoint with real TensorFlow, read
it back with the pure-python reader."""

import numpy as np
import pytest

from ron_tensorflow_tpu.train.tf_checkpoint import TFCheckpointReader, slim_vgg_to_flat


@pytest.fixture(scope="module")
def tf_ckpt(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    w11 = rng.normal(size=(3, 3, 3, 64)).astype(np.float32)
    b11 = rng.normal(size=(64,)).astype(np.float32)
    fc6 = rng.normal(size=(3, 3, 512, 1024)).astype(np.float32)
    step = np.int64(7)

    class Holder(tf.Module):
        def __init__(self):
            super().__init__()
            self.v1 = tf.Variable(w11, name="ron_320_vgg/conv1/conv1_1/weights")
            self.v2 = tf.Variable(b11, name="ron_320_vgg/conv1/conv1_1/biases")
            self.v3 = tf.Variable(fc6, name="ron_320_vgg/fc6/weights")
            self.v4 = tf.Variable(step, name="global_step")

    holder = Holder()
    ckpt = tf.train.Checkpoint(holder=holder)
    prefix = str(tmp_path_factory.mktemp("ckpt") / "model.ckpt")
    path = ckpt.write(prefix)
    return path, {"w11": w11, "b11": b11, "fc6": fc6, "step": step}


def test_reader_roundtrip(tf_ckpt):
    path, ref = tf_ckpt
    r = TFCheckpointReader(path)
    names = r.variable_names()
    assert len(names) >= 4
    by_suffix = {}
    for n in names:
        t = r.get_tensor(n)
        by_suffix[tuple(t.shape)] = t
    np.testing.assert_allclose(by_suffix[(3, 3, 3, 64)], ref["w11"])
    np.testing.assert_allclose(by_suffix[(64,)], ref["b11"])
    np.testing.assert_allclose(by_suffix[(3, 3, 512, 1024)], ref["fc6"])
    assert by_suffix[()] == 7


def test_slim_name_mapping():
    tensors = {
        "ron_320_vgg/conv1/conv1_1/weights": np.zeros((3, 3, 3, 64)),
        "ron_320_vgg/conv1/conv1_1/biases": np.zeros((64,)),
        "ron_320_vgg/fc6/weights": np.zeros((3, 3, 512, 1024)),
        "ron_320_vgg/reverse_module/whatever/weights": np.zeros((1,)),
        "global_step": np.zeros(()),
    }
    flat = slim_vgg_to_flat(tensors)
    assert set(flat) == {
        "backbone/conv1_1/conv/kernel",
        "backbone/conv1_1/conv/bias",
        "backbone/fc6/conv/kernel",
    }
