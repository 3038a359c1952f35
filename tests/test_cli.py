"""CLI driver smoke tests: every subcommand exercised in-process on the
tiny model (the reference's seven drivers collapsed into one CLI —
ref: ron_net.py, eval_ron_network.py, ron_eval.py, tf_convert_data.py,
inspect_checkpoint.py; SURVEY §1 L6)."""

import os

import numpy as np
import pytest

from ron_tensorflow_tpu.cli import main


def _ann_xml(size_wh, objs):
    w, h = size_wh
    parts = [
        f"<annotation><size><width>{w}</width><height>{h}</height>"
        "<depth>3</depth></size>"
    ]
    for name, (x1, y1, x2, y2), diff in objs:
        parts.append(
            f"<object><name>{name}</name><difficult>{diff}</difficult>"
            f"<truncated>0</truncated><bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
        )
    parts.append("</annotation>")
    return "".join(parts)


def _make_vocdevkit(root, n_images=8):
    """VOC2007-style tree with drawn boxes; ids 000001..n in train+test."""
    from PIL import Image, ImageDraw

    year = root / "VOC2007"
    (year / "Annotations").mkdir(parents=True)
    (year / "ImageSets" / "Main").mkdir(parents=True)
    (year / "JPEGImages").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = ["dog", "car", "cat", "person"]
    ids = [f"{i:06d}" for i in range(1, n_images + 1)]
    for i, image_id in enumerate(ids):
        img = Image.fromarray(rng.integers(0, 60, (128, 128, 3), np.uint8))
        draw = ImageDraw.Draw(img)
        x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        x2, y2 = x1 + int(rng.integers(40, 70)), y1 + int(rng.integers(40, 70))
        draw.rectangle((x1, y1, x2, y2), fill=(220, 40, 40))
        img.save(year / "JPEGImages" / f"{image_id}.jpg")
        (year / "Annotations" / f"{image_id}.xml").write_text(
            _ann_xml((128, 128), [(names[i % len(names)], (x1, y1, x2, y2), 0)])
        )
    listing = "\n".join(ids) + "\n"
    (year / "ImageSets" / "Main" / "train.txt").write_text(listing)
    (year / "ImageSets" / "Main" / "test.txt").write_text(listing)
    return root


TRAIN_OVERRIDES = [
    "model=ron_tiny_vgg",
    "data.file_pattern=voc_2007_train_*.tfrecord",
    "data.batch_size=4",
    "data.max_boxes=8",
    "data.working_shape=[64, 64]",
    "max_steps=2",
    "save_every_steps=2",
    "log_every_steps=1",
    "bfloat16=false",
    "mesh_shape=[2, 1]",
    "optimizer.learning_rate=0.001",
    "optimizer.learning_rate_decay_type=fixed",
]


@pytest.fixture(scope="module")
def cli_workspace(tmp_path_factory):
    """convert-data + train once; the other subcommands read the results."""
    tmp = tmp_path_factory.mktemp("cli")
    voc_root = _make_vocdevkit(tmp / "VOCdevkit")
    records = tmp / "records"
    main(
        [
            "convert-data",
            "--voc-root", str(voc_root / "VOC2007"),
            "--output-dir", str(records),
            "--output-name", "voc_2007_train",
        ]
    )
    model_dir = tmp / "model"
    main(
        ["train", "--model-dir", str(model_dir), "--dataset-dir", str(records)]
        + TRAIN_OVERRIDES
    )
    return {
        "voc_root": str(voc_root),
        "records": str(records),
        "model_dir": str(model_dir),
        "image": str(voc_root / "VOC2007" / "JPEGImages" / "000001.jpg"),
    }


@pytest.mark.slow
def test_cli_convert_and_train_outputs(cli_workspace):
    shards = [
        f for f in os.listdir(cli_workspace["records"]) if f.endswith(".tfrecord")
    ]
    assert shards == ["voc_2007_train_000.tfrecord"]
    assert os.path.exists(os.path.join(cli_workspace["model_dir"], "metrics.jsonl"))
    # orbax checkpoint for step 2
    assert os.path.isdir(os.path.join(cli_workspace["model_dir"], "2"))


def test_cli_eval(cli_workspace, capsys):
    main(
        [
            "eval",
            "--model-dir", cli_workspace["model_dir"],
            "--dataset-dir", cli_workspace["records"],
            "model=ron_tiny_vgg",
            "data.file_pattern=voc_2007_train_*.tfrecord",
            "data.batch_size=4",
            "data.max_boxes=8",
            "select_top_k=64",
            "keep_top_k=16",
            "max_batches=1",
            "mesh_shape=[2, 1]",  # sharded data-parallel eval path
        ]
    )
    out = capsys.readouterr().out
    assert "restored step 2" in out
    assert "mAP (VOC07 metric)" in out and "mAP (VOC12 metric)" in out


def test_cli_realtime_eval(cli_workspace, capsys):
    main(
        [
            "realtime-eval",
            "--model", "ron_tiny_vgg",
            "--model-dir", cli_workspace["model_dir"],
            "--voc-root", cli_workspace["voc_root"],
            "--max-images", "2",
            "--objectness-threshold", "0.0",
            "--output-dir", os.path.join(cli_workspace["voc_root"], "out"),
        ]
    )
    out = capsys.readouterr().out
    assert "Mean AP" in out


def test_cli_infer(cli_workspace, tmp_path, capsys):
    main(
        [
            "infer",
            cli_workspace["image"],
            "--model", "ron_tiny_vgg",
            "--model-dir", cli_workspace["model_dir"],
            "--output-dir", str(tmp_path / "Debug"),
            "--objectness-threshold", "0.0",
        ]
    )
    out = capsys.readouterr().out
    assert "detections ->" in out
    assert os.listdir(tmp_path / "Debug")  # annotated output image written


def test_cli_inspect_ckpt(cli_workspace, capsys):
    main(
        [
            "inspect-ckpt",
            "--model", "ron_tiny_vgg",
            "--model-dir", cli_workspace["model_dir"],
            "--pattern", "conv1_1",
        ]
    )
    out = capsys.readouterr().out
    assert "step: 2" in out
    assert "conv1_1" in out and "l2=" in out


@pytest.mark.slow
def test_cli_train_resume_and_ema_eval(cli_workspace, tmp_path, capsys):
    """EMA training -> EMA-restore eval (use_ema=true), plus resume."""
    model_dir = str(tmp_path / "ema_model")
    ema_overrides = TRAIN_OVERRIDES + ["ema_decay=0.9"]
    main(
        ["train", "--model-dir", model_dir, "--dataset-dir", cli_workspace["records"]]
        + ema_overrides
    )
    # resume continues from the checkpoint instead of starting over
    main(
        ["train", "--model-dir", model_dir, "--dataset-dir", cli_workspace["records"]]
        + [ov if ov != "max_steps=2" else "max_steps=3" for ov in ema_overrides]
    )
    out = capsys.readouterr().out
    assert "resumed from step 2" in out

    main(
        [
            "eval",
            "--model-dir", model_dir,
            "--dataset-dir", cli_workspace["records"],
            "model=ron_tiny_vgg",
            "data.file_pattern=voc_2007_train_*.tfrecord",
            "data.batch_size=4",
            "data.max_boxes=8",
            "select_top_k=64",
            "keep_top_k=16",
            "max_batches=1",
            "use_ema=true",
        ]
    )
    out = capsys.readouterr().out
    assert "restored step 3" in out and "mAP (VOC07 metric)" in out


@pytest.mark.slow
def test_cli_eval_wait_for_checkpoints(cli_workspace, tmp_path, capsys, monkeypatch):
    """Continuous-eval mode (ref: eval_ssd_network.py wait_for_checkpoints):
    a second checkpoint appearing between polls is picked up and evaluated."""
    import shutil

    # model dir with the step-2 checkpoint; a step-5 copy appears "later"
    model_dir = tmp_path / "watch"
    shutil.copytree(cli_workspace["model_dir"], model_dir)

    def fake_sleep(secs):
        # simulate training writing a newer checkpoint while eval waits
        if not (model_dir / "5").exists():
            shutil.copytree(model_dir / "2", model_dir / "5")

    monkeypatch.setattr("time.sleep", fake_sleep)
    main(
        [
            "eval",
            "--model-dir", str(model_dir),
            "--dataset-dir", cli_workspace["records"],
            "model=ron_tiny_vgg",
            "data.file_pattern=voc_2007_train_*.tfrecord",
            "data.batch_size=4",
            "data.max_boxes=8",
            "select_top_k=64",
            "keep_top_k=16",
            "max_batches=1",
            "wait_for_checkpoints=true",
            "max_evals=2",
            "eval_interval_secs=0",
        ]
    )
    out = capsys.readouterr().out
    assert "restored step 2" in out and "restored step 5" in out
    assert out.count("mAP (VOC07 metric)") == 2


@pytest.mark.slow
def test_cli_import_ckpt_torch_then_infer(cli_workspace, tmp_path, capsys):
    """Reference-user migration path: torch VGG16 state_dict -> import-ckpt
    -> orbax model dir -> infer restores it."""
    torch = pytest.importorskip("torch")
    channels = [
        (3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
        (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
        (512, 512), (512, 512),
    ]
    ids = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    sd = {}
    gen = torch.Generator().manual_seed(0)
    for idx, (ci, co) in zip(ids, channels):
        sd[f"features.{idx}.weight"] = torch.randn((co, ci, 3, 3), generator=gen) * 0.01
        sd[f"features.{idx}.bias"] = torch.zeros((co,))
    src = str(tmp_path / "vgg16.pth")
    torch.save(sd, src)

    model_dir = str(tmp_path / "imported")
    main(
        [
            "import-ckpt",
            "--format", "torch",
            "--source", src,
            "--model", "ron_tiny_vgg",
            "--model-dir", model_dir,
        ]
    )
    out = capsys.readouterr().out
    assert "imported torch checkpoint" in out
    # 13 conv kernels + 13 biases restored, heads left at init
    assert "restored 26 tensors" in out

    main(
        [
            "infer",
            cli_workspace["image"],
            "--model", "ron_tiny_vgg",
            "--model-dir", model_dir,
            "--output-dir", str(tmp_path / "out"),
            "--objectness-threshold", "0.0",
        ]
    )
    assert "detections ->" in capsys.readouterr().out


def test_cli_unknown_override_rejected(cli_workspace):
    with pytest.raises(KeyError):
        main(
            ["train", "--model-dir", "/tmp/x", "--dataset-dir",
             cli_workspace["records"], "no_such_field=1"]
        )
