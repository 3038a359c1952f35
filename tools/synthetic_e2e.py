"""Full production-path validation on a synthetic detection dataset.

Generates a 6-class shapes dataset (distinct colors, rectangles/ellipses),
writes TFRecord shards, trains RON-tiny through the REAL Trainer (host
pipeline -> device augmentation -> fused train step -> orbax checkpoints),
then evaluates held-out mAP with the streaming evaluator. Unlike
`overfit_check.py`, the eval split is disjoint from training, so a good mAP
demonstrates generalization through the entire stack.

Run: PYTHONPATH=.:/root/.axon_site python tools/synthetic_e2e.py
Expected: mAP(voc07) >= 0.6 on the held-out split after ~1500 steps.
"""

import io
import os
import sys
import tempfile

import numpy as np


def make_dataset(out_dir: str, n_train=800, n_test=96, seed=0, canvas=128):
    from PIL import Image, ImageDraw

    from ron_tensorflow_tpu.data.convert import encode_voc_example
    from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
    from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject

    rng = np.random.default_rng(seed)
    colors = [(230, 40, 40), (40, 230, 40), (40, 40, 230),
              (230, 230, 40), (230, 40, 230), (40, 230, 230)]

    def gen_sample():
        img = Image.fromarray(rng.integers(0, 80, (canvas, canvas, 3), np.uint8))
        draw = ImageDraw.Draw(img)
        objects = []
        for _ in range(1 + int(rng.integers(0, 2))):
            cls = 1 + int(rng.integers(0, 6))
            w, h = rng.uniform(0.25, 0.55, 2) * canvas
            x0 = rng.uniform(0, canvas - w)
            y0 = rng.uniform(0, canvas - h)
            box = (x0, y0, x0 + w, y0 + h)
            # classes 1-3 rectangles, 4-6 ellipses, color cycles
            if cls <= 3:
                draw.rectangle(box, fill=colors[cls - 1])
            else:
                draw.ellipse(box, fill=colors[cls - 1])
            objects.append(
                VocObject(cls, f"class{cls}",
                          (y0 / canvas, x0 / canvas, (y0 + h) / canvas, (x0 + w) / canvas), 0, 0)
            )
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        return buf.getvalue(), VocAnnotation((canvas, canvas, 3), objects)

    os.makedirs(out_dir, exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        with TFRecordWriter(os.path.join(out_dir, f"synth_{split}_000.tfrecord")) as w:
            for _ in range(n):
                data, ann = gen_sample()
                w.write(encode_voc_example(data, ann))
    return out_dir


def main():
    from dataclasses import replace

    import jax
    import numpy as np

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.data.pipeline import PipelineConfig, batch_iterator
    from ron_tensorflow_tpu.data.preprocess import whiten_np
    from ron_tensorflow_tpu.eval import StreamingEvaluator
    from ron_tensorflow_tpu.inference.detector import DetectionConfig
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.train.trainer import Trainer

    model_name = os.environ.get("SYNTH_MODEL", "ron_tiny_vgg")
    canvas = int(os.environ.get("SYNTH_CANVAS", "128"))
    batch = int(os.environ.get("SYNTH_BATCH", "32"))
    bf16 = os.environ.get("SYNTH_BF16", "false")
    work = tempfile.mkdtemp(prefix="synth_e2e_")
    data_dir = make_dataset(os.path.join(work, "records"), canvas=canvas)
    print(f"dataset at {data_dir} (canvas {canvas}, model {model_name})")

    steps = int(os.environ.get("SYNTH_STEPS", "1500"))
    lr = os.environ.get("SYNTH_LR", "0.003")
    warmup = os.environ.get("SYNTH_WARMUP", "0")
    cfg = apply_overrides(
        TrainConfig(),
        [
            f"model={model_name}",
            f"model_dir={work}/model",
            f"data.dataset_dir={data_dir}",
            "data.file_pattern=synth_train_*.tfrecord",
            f"data.batch_size={batch}",
            "data.max_boxes=8",
            f"max_steps={steps}",
            "log_every_steps=100",
            "save_every_steps=1000",
            f"optimizer.learning_rate={lr}",
            f"optimizer.warmup_steps={warmup}",
            f"optimizer.clip_global_norm={os.environ.get('SYNTH_CLIP', '0')}",
            "optimizer.learning_rate_decay_type=piecewise",
            f"optimizer.lr_boundaries=[{int(steps * 0.6)}, {int(steps * 0.85)}]",
            "optimizer.lr_factors=[1.0, 0.1, 0.01]",
            "match.positive_threshold=0.5",
            "mesh_shape=[1, 1]",
            f"bfloat16={bf16}",
            # train-perf knobs (A/B quality equivalence of the fast paths)
            f"bn_fast_normalize={os.environ.get('SYNTH_BN_FAST', 'false')}",
            f"fuse_block1={os.environ.get('SYNTH_FUSE_BLOCK1', 'false')}",
        ],
    )
    cfg = replace(cfg, data=replace(cfg.data, working_shape=(canvas, canvas)))
    trainer = Trainer(cfg)
    state = trainer.train()
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}

    model, spec = get_network(model_name)
    model = model.clone(dtype=jax.numpy.bfloat16)  # production inference mode
    ev = StreamingEvaluator(
        model, spec,
        DetectionConfig(top_k=64 if model_name == "ron_tiny_vgg" else 200,
                        keep_top_k=16 if model_name == "ron_tiny_vgg" else 100,
                        select_threshold=0.05, objectness_threshold=0.03),
    )
    pcfg = PipelineConfig(batch_size=8, working_shape=spec.img_shape, max_boxes=8,
                          shuffle=False, keep_difficult=True)
    test_files = [os.path.join(data_dir, "synth_test_000.tfrecord")]

    def eval_batches():
        for hb in batch_iterator(test_files, pcfg, epochs=1, drop_remainder=False):
            yield {
                "image": whiten_np(hb["image01"]),
                "gt_labels": hb["gt_labels"],
                "gt_boxes": hb["gt_boxes"],
                "gt_difficult": hb["gt_difficult"],
                "sample_valid": hb["sample_valid"],
            }

    map07, map12, aps, stats = ev.run(variables, eval_batches(), log_every=0)
    used = {c: round(v, 3) for c, v in aps.items() if c <= 6}
    print("held-out per-class AP07:", used)
    print(f"held-out mAP07 (classes 1-6) = {np.mean(list(used.values())):.4f}  "
          f"(all-21-class mAP {map07:.4f}, mAP12 {map12:.4f})")
    ok = np.mean(list(used.values())) >= 0.6
    print("SYNTHETIC E2E:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
