"""TensorBoard event-writer tests — the hand-encoded Event/Summary protos are
verified by TENSORFLOW'S OWN event reader (tf.compat.v1.train.summary_iterator),
so files are guaranteed readable by real TensorBoard."""

import numpy as np
import pytest

from ron_tensorflow_tpu.utils.tensorboard import TensorBoardWriter


def test_events_readable_by_tf(tmp_path):
    tf = pytest.importorskip("tensorflow")

    w = TensorBoardWriter(str(tmp_path))
    w.scalar("loss/total", 3.25, step=10)
    w.scalars({"a": 1.0, "b": 2.5, "skip": "text"}, step=20, prefix="train")
    img = np.zeros((8, 6, 3), np.uint8)
    img[2:5, 1:4] = (255, 0, 0)
    w.image("debug/gt", img, step=30)
    w.close()

    events = list(tf.compat.v1.train.summary_iterator(w.path))
    assert events[0].file_version == "brain.Event:2"

    scalars = {}
    image_value = None
    for ev in events[1:]:
        for v in ev.summary.value:
            if v.HasField("simple_value"):
                scalars[(ev.step, v.tag)] = v.simple_value
            if v.HasField("image"):
                image_value = (ev.step, v.tag, v.image)
    assert scalars[(10, "loss/total")] == pytest.approx(3.25)
    assert scalars[(20, "train/a")] == pytest.approx(1.0)
    assert scalars[(20, "train/b")] == pytest.approx(2.5)
    assert (20, "train/skip") not in scalars  # non-numeric dropped

    step, tag, im = image_value
    assert (step, tag) == (30, "debug/gt")
    assert (im.height, im.width, im.colorspace) == (8, 6, 3)
    decoded = np.asarray(
        tf.io.decode_png(im.encoded_image_string)
    )
    np.testing.assert_array_equal(decoded, img)


def test_scalars_accept_numpy_and_jax(tmp_path):
    import jax.numpy as jnp

    w = TensorBoardWriter(str(tmp_path))
    w.scalars({"x": np.float32(1.5), "y": jnp.asarray(2.5)}, step=1)
    w.close()
    # parsable framing: our own TFRecord reader can walk the file
    from ron_tensorflow_tpu.data.tfrecord import read_records

    records = list(read_records(w.path))
    assert len(records) == 2  # file_version + one scalar event
