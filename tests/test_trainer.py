"""Trainer driver integration test: tiny model, synthetic shards, real
Trainer path (pipeline + device augmentation + checkpointing + resume)."""

import io
import os

import numpy as np
import pytest

from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
from ron_tensorflow_tpu.data.convert import encode_voc_example
from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject


def write_shards(tmp_path, n=8):
    from PIL import Image

    rng = np.random.default_rng(0)
    path = str(tmp_path / "voc_2007_train_000.tfrecord")
    with TFRecordWriter(path) as w:
        for i in range(n):
            arr = rng.integers(0, 255, (96, 128, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ann = VocAnnotation(
                shape=(96, 128, 3),
                objects=[
                    VocObject(1 + i % 20, "x", (0.2, 0.2, 0.7, 0.7), 0, 0),
                ],
            )
            w.write(encode_voc_example(buf.getvalue(), ann))
    return str(tmp_path)


@pytest.fixture
def tiny_train_config(tmp_path, monkeypatch):
    # register the tiny spec under a model name
    import ron_tensorflow_tpu.models as models
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    orig = models.get_network

    def patched(name):
        if name == "ron_tiny":
            return RON(spec=RON_TINY_SPEC), RON_TINY_SPEC
        return orig(name)

    monkeypatch.setattr(models, "get_network", patched)
    monkeypatch.setattr("ron_tensorflow_tpu.train.trainer.get_network", patched)

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides

    data_dir = write_shards(tmp_path)
    cfg = apply_overrides(
        TrainConfig(),
        [
            "model=ron_tiny",
            f"model_dir={tmp_path}/model",
            f"data.dataset_dir={data_dir}",
            "data.file_pattern=voc_2007_train_*.tfrecord",
            "data.batch_size=4",
            "data.max_boxes=8",
            "bfloat16=false",
            "max_steps=4",
            "log_every_steps=2",
            "save_every_steps=4",
            "optimizer.learning_rate=0.001",
            "optimizer.learning_rate_decay_type=fixed",
            "mesh_shape=[4, 1]",
            "dump_debug_images_every=2",
        ],
    )
    # working canvas small for speed
    from dataclasses import replace

    cfg = replace(cfg, data=replace(cfg.data, working_shape=(128, 128)))
    return cfg


@pytest.mark.slow
def test_trainer_end_to_end_and_resume(tiny_train_config):
    from ron_tensorflow_tpu.train.trainer import Trainer

    t = Trainer(tiny_train_config)
    state = t.train()
    assert int(state.step) == 4
    # metrics written
    assert os.path.exists(os.path.join(tiny_train_config.model_dir, "metrics.jsonl"))
    # TensorBoard event file written (content verified in test_tensorboard.py)
    assert any(
        f.startswith("events.out.tfevents.")
        for f in os.listdir(tiny_train_config.model_dir)
    )
    # debug image dumps (dump_debug_images_every=2 -> steps 2 and 4)
    debug = os.path.join(tiny_train_config.model_dir, "debug")
    assert sorted(os.listdir(debug)) == ["step_000002.jpg", "step_000004.jpg"]
    # checkpoint written
    assert t._ckpt.latest_step() == 4

    # Resume: new Trainer restores step 4 and continues to 6.
    from dataclasses import replace

    t2 = Trainer(replace(tiny_train_config, max_steps=6))
    state2 = t2.train()
    assert int(state2.step) == 6


@pytest.mark.slow
def test_trainer_time_based_save(tiny_train_config, tmp_path):
    """save_interval_secs triggers checkpoints between save_every_steps marks
    (ref: ron_net.py:415 save_interval_secs)."""
    from dataclasses import replace

    from ron_tensorflow_tpu.train.trainer import Trainer

    cfg = replace(
        tiny_train_config,
        model_dir=str(tmp_path / "timed"),
        max_steps=3,
        save_every_steps=1000,  # never due by step count
        save_interval_secs=0.0,  # always due by time
        dump_debug_images_every=0,
        tensorboard=False,
    )
    t = Trainer(cfg)
    t.train()
    # every step checkpointed: time_due after each step
    assert sorted(t._ckpt._mgr.all_steps()) == [1, 2, 3]


@pytest.mark.slow
def test_trainer_host_rss_guard_saves_and_exits_75(tiny_train_config, tmp_path):
    """max_host_rss_gb: checkpoint at the current step + SystemExit(75) so a
    supervisor restart resumes cleanly instead of losing work to a SIGKILL."""
    from dataclasses import replace

    from ron_tensorflow_tpu.train.trainer import Trainer

    cfg = replace(
        tiny_train_config,
        model_dir=str(tmp_path / "guard"),
        max_steps=200,
        save_every_steps=1000,
        max_host_rss_gb=0.001,  # any live process exceeds this immediately
        dump_debug_images_every=0,
        tensorboard=False,
    )
    t = Trainer(cfg)
    with pytest.raises(SystemExit) as e:
        t.train()
    assert e.value.code == 75
    # saved at the guard step (step 1 — any live process exceeds 1 MB)
    assert t._ckpt.latest_step() == 1
    # and a fresh Trainer resumes from there
    t2 = Trainer(replace(cfg, max_host_rss_gb=0.0, max_steps=3))
    state = t2.train()
    assert int(state.step) == 3


@pytest.mark.slow
def test_trainer_float32_transport_branch(tiny_train_config, tmp_path):
    """The batches= hook feeds float01 images (the non-uint8 branch of
    full_step); make_batches covers the uint8 branch in the e2e test."""
    from dataclasses import replace

    from ron_tensorflow_tpu.train.trainer import Trainer

    cfg = replace(
        tiny_train_config,
        model_dir=str(tmp_path / "float_model"),
        max_steps=2,
        dump_debug_images_every=0,
        tensorboard=False,
    )
    t = Trainer(cfg)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "image01": rng.uniform(0, 1, (4, 128, 128, 3)).astype(np.float32),
                "gt_boxes": np.tile(
                    np.array([[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 7], np.float32),
                    (4, 1, 1),
                ),
                "gt_labels": np.tile(
                    np.array([[3] + [0] * 7], np.int32), (4, 1)
                ),
                "gt_valid": np.tile(
                    np.array([[True] + [False] * 7]), (4, 1)
                ),
            }

    state = t.train(batches=batches())
    assert int(state.step) == 2
