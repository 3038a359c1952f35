"""21-class VOC-scale synthetic dress rehearsal of the flagship recipe
(VERDICT r2 #3).

Generates a 21-class shapes dataset at VOC scale — default 10k train / 1k
test images at VOC-like variable resolutions, 1-4 objects each, ~10%
difficult flags — in BOTH layouts from the SAME samples: TFRecord shards
(streaming eval) and a VOCdevkit tree (realtime eval + official VOC
protocol). Trains the published recipe shape (bs 14, momentum 0.9, lr 1e-3
piecewise x{1, 0.1, 0.01} at 75%/96% of the schedule, warm start from an
imported torch-format VGG16 checkpoint — ref: ron_net.py:52-63,95-105,
152-155), then evaluates with the streaming AND realtime paths and checks
they agree.

Run: PYTHONPATH=.:/root/.axon_site python tools/dress_rehearsal.py [workdir]
Env:
  DR_MODEL  ron_320_vgg (default) | ron_320_vgg_heavy | ssd_300_vgg | ssd_512_vgg
  DR_STEPS  total steps (default 20000)
  DR_TRAIN / DR_TEST  dataset sizes (default 10000 / 1000)
  DR_BATCH  batch size (default 14 — the published flag)
  DR_CROWDED=1  long-tail object counts (1..48 per image, mean ~8) with
    overlapping same-class clusters and tiny+difficult objects — real VOC
    images carry up to ~40 objects; this exercises the dual-max matcher
    tie-breaks, 3:1 sampling saturation, per-class NMS and shared_top_k
    preselection at crowd scale (VERDICT r3 weak #2). Raises the GT pad
    (max_boxes) to 56 on both the train and eval pipelines.
  DR_OBJ_THRESH  realtime objectness gate (default 0.95 — the published flag)
  DR_LR / DR_WARMUP / DR_CLIP  recipe overrides (defaults are per-model,
    see main(); SSD-512 needs lr 1e-3 / warmup 2000 — 3e-3 collapses it)
  DR_SKIP_TRAIN=1  reuse an existing workdir's checkpoint (eval only)
"""

import io
import json
import os
import sys
import time

import numpy as np

# The 20 VOC class names keep the VOCdevkit evaluator's name->index mapping
# intact; class k's synthetic appearance is (shape, color) combo k.
SHAPES = ("rect", "ellipse", "triangle", "bar", "ring")
COLORS = ((235, 45, 45), (45, 235, 45), (65, 65, 245), (235, 235, 45))


def _draw_object(draw, cls, box):
    """Deterministic appearance per class id (1..20)."""
    shape = SHAPES[(cls - 1) % 5]
    color = COLORS[(cls - 1) // 5]
    x0, y0, x1, y1 = box
    if shape == "rect":
        draw.rectangle(box, fill=color)
    elif shape == "ellipse":
        draw.ellipse(box, fill=color)
    elif shape == "triangle":
        draw.polygon([(x0, y1), (x1, y1), ((x0 + x1) / 2, y0)], fill=color)
    elif shape == "bar":
        h = y1 - y0
        draw.rectangle((x0, y0 + 0.35 * h, x1, y1 - 0.35 * h), fill=color)
    else:  # ring
        draw.ellipse(box, fill=color)
        w, h = x1 - x0, y1 - y0
        draw.ellipse((x0 + 0.3 * w, y0 + 0.3 * h, x1 - 0.3 * w, y1 - 0.3 * h),
                     fill=(40, 40, 40))


def make_dataset(out_root, n_train=10000, n_test=1000, seed=0, crowded=False):
    """Write records/ (TFRecord shards) and VOCdevkit/VOC2007 (JPEG + XML +
    ImageSets) from the same generated samples.

    crowded: long-tail object counts (1..48, mean ~8) with overlapping
    same-class clusters and tiny objects — matches real VOC's crowd tail
    (up to ~40 objects/image) instead of the sparse 1-4 default."""
    from PIL import Image, ImageDraw

    from ron_tensorflow_tpu.data.convert import encode_voc_example
    from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
    from ron_tensorflow_tpu.data.voc import VOC_CLASSES, VocAnnotation, VocObject

    rng = np.random.default_rng(seed)
    rec_dir = os.path.join(out_root, "records")
    voc_dir = os.path.join(out_root, "VOCdevkit", "VOC2007")
    os.makedirs(rec_dir, exist_ok=True)
    for sub in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(voc_dir, sub), exist_ok=True)

    def n_objects():
        if not crowded:
            return 1 + int(rng.integers(0, 4))
        # long-tail: 55% sparse (1-5), 35% medium (6-18), 10% crowd (19-48)
        u = rng.uniform()
        if u < 0.55:
            return 1 + int(rng.integers(0, 5))
        if u < 0.90:
            return 6 + int(rng.integers(0, 13))
        return 19 + int(rng.integers(0, 30))

    def gen_sample():
        h = int(rng.integers(320, 500))
        w = int(rng.integers(320, 500))
        img = Image.fromarray(
            (rng.integers(0, 70, (h, w, 3)) + rng.integers(0, 40)).astype(np.uint8)
        )
        draw = ImageDraw.Draw(img)
        objects = []
        n = n_objects()
        lo_frac = 0.04 if crowded else 0.12  # crowded scenes get tiny objects
        i = 0
        while i < n:
            cls = 1 + int(rng.integers(0, 20))
            if crowded and n - i >= 3 and rng.uniform() < 0.35:
                # overlapping same-class cluster (dual-max tie-break fodder)
                k = min(3 + int(rng.integers(0, 3)), n - i)
                s = rng.uniform(0.08, 0.22)
                cyc = rng.uniform(s, 1 - s)
                cxc = rng.uniform(s, 1 - s)
                for _ in range(k):
                    ow = s * rng.uniform(0.8, 1.2) * w
                    oh = s * rng.uniform(0.8, 1.2) * h
                    x0 = np.clip(cxc * w + rng.uniform(-0.6, 0.6) * ow - ow / 2, 0, w - ow)
                    y0 = np.clip(cyc * h + rng.uniform(-0.6, 0.6) * oh - oh / 2, 0, h - oh)
                    _draw_object(draw, cls, (x0, y0, x0 + ow, y0 + oh))
                    difficult = int(min(ow / w, oh / h) < 0.08 and rng.uniform() < 0.5)
                    objects.append(
                        VocObject(
                            label=cls,
                            label_text=VOC_CLASSES[cls - 1],
                            bbox=(y0 / h, x0 / w, (y0 + oh) / h, (x0 + ow) / w),
                            difficult=difficult,
                            truncated=0,
                        )
                    )
                    i += 1
                continue
            ow = rng.uniform(lo_frac, 0.5) * w
            oh = rng.uniform(lo_frac, 0.5) * h
            x0 = rng.uniform(0, w - ow)
            y0 = rng.uniform(0, h - oh)
            _draw_object(draw, cls, (x0, y0, x0 + ow, y0 + oh))
            # small objects are 'difficult' (excluded from AP like VOC)
            thr = 0.08 if crowded else 0.15
            difficult = int(min(ow / w, oh / h) < thr and rng.uniform() < 0.5)
            objects.append(
                VocObject(
                    label=cls,
                    label_text=VOC_CLASSES[cls - 1],
                    bbox=(y0 / h, x0 / w, (y0 + oh) / h, (x0 + ow) / w),
                    difficult=difficult,
                    truncated=0,
                )
            )
            i += 1
        if crowded and len(objects) > 1:
            # Mark objects that later draws painted over as 'difficult'
            # (VOC semantics: excluded from AP). A fully-occluded gt is
            # undetectable from pixels but would still count against AP —
            # without this the crowded ceiling sits far below 1 for reasons
            # that have nothing to do with the detector. Visibility is
            # computed on a z-order index raster (128x128).
            own = np.full((128, 128), -1, np.int32)
            for k, o in enumerate(objects):
                ymin, xmin, ymax, xmax = o.bbox
                r0, r1 = int(ymin * 128), max(int(ymin * 128) + 1, int(ymax * 128))
                c0, c1 = int(xmin * 128), max(int(xmin * 128) + 1, int(xmax * 128))
                own[r0:r1, c0:c1] = k
            for k, o in enumerate(objects):
                ymin, xmin, ymax, xmax = o.bbox
                r0, r1 = int(ymin * 128), max(int(ymin * 128) + 1, int(ymax * 128))
                c0, c1 = int(xmin * 128), max(int(xmin * 128) + 1, int(xmax * 128))
                area = (r1 - r0) * (c1 - c0)
                visible = int((own[r0:r1, c0:c1] == k).sum())
                if area > 0 and visible / area < 0.3:
                    objects[k] = VocObject(
                        label=o.label, label_text=o.label_text, bbox=o.bbox,
                        difficult=1, truncated=o.truncated,
                    )
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        return buf.getvalue(), (h, w), objects

    def ann_xml(hw, objects):
        h, w = hw
        parts = [
            f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"<depth>3</depth></size>"
        ]
        for o in objects:
            ymin, xmin, ymax, xmax = o.bbox
            parts.append(
                f"<object><name>{o.label_text}</name><difficult>{o.difficult}</difficult>"
                f"<truncated>0</truncated><bndbox>"
                f"<xmin>{xmin * w:.1f}</xmin><ymin>{ymin * h:.1f}</ymin>"
                f"<xmax>{xmax * w:.1f}</xmax><ymax>{ymax * h:.1f}</ymax>"
                f"</bndbox></object>"
            )
        parts.append("</annotation>")
        return "".join(parts)

    per_shard = 2000
    t0 = time.time()
    test_ids = []
    for split, n in (("train", n_train), ("test", n_test)):
        writer, wi = None, -1
        for i in range(n):
            if i // per_shard != wi:
                if writer:
                    writer.close()
                wi = i // per_shard
                writer = TFRecordWriter(
                    os.path.join(rec_dir, f"synth_{split}_{wi:03d}.tfrecord")
                )
            jpeg, hw, objects = gen_sample()
            ann = VocAnnotation((hw[0], hw[1], 3), objects)
            writer.write(encode_voc_example(jpeg, ann))
            if split == "test":
                image_id = f"{i:06d}"
                test_ids.append(image_id)
                with open(os.path.join(voc_dir, "JPEGImages", image_id + ".jpg"), "wb") as f:
                    f.write(jpeg)
                with open(os.path.join(voc_dir, "Annotations", image_id + ".xml"), "w") as f:
                    f.write(ann_xml(hw, objects))
        if writer:
            writer.close()
        print(f"[data] {split}: {n} samples ({time.time() - t0:.0f}s)")
    with open(os.path.join(voc_dir, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(test_ids) + "\n")
    return rec_dir, os.path.join(out_root, "VOCdevkit")


def make_torch_vgg_checkpoint(path, seed=0):
    """Random torchvision-layout VGG16 state_dict — exercises the real
    torch-import warm-start machinery (the reference warm-started from
    vgg16_reducedfc, ref: README.md:28; weights here are random because the
    environment has no pretrained artifacts)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    sd, idx, cin = {}, 0, 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = (
            torch.randn((v, cin, 3, 3), generator=gen) * (2.0 / (9 * cin)) ** 0.5
        )
        sd[f"features.{idx}.bias"] = torch.zeros((v,))
        cin = v
        idx += 2
    torch.save(sd, path)
    return path


def main():
    from dataclasses import replace

    import jax

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.data.pipeline import PipelineConfig, PrefetchIterator, batch_iterator
    from ron_tensorflow_tpu.data.preprocess import whiten_np
    from ron_tensorflow_tpu.eval import StreamingEvaluator
    from ron_tensorflow_tpu.eval.realtime import RealtimeEvaluator
    from ron_tensorflow_tpu.inference.detector import DetectionConfig, RealtimeConfig
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.train.trainer import Trainer

    model_name = os.environ.get("DR_MODEL", "ron_320_vgg")
    steps = int(os.environ.get("DR_STEPS", "20000"))
    batch = int(os.environ.get("DR_BATCH", "14"))
    n_train = int(os.environ.get("DR_TRAIN", "10000"))
    n_test = int(os.environ.get("DR_TEST", "1000"))
    crowded = bool(int(os.environ.get("DR_CROWDED", "0")))
    # crowded scenes need the full 56-GT pipeline pad; sparse scenes keep the
    # tight pad (cheaper encoder)
    max_boxes = 56 if crowded else 8
    work = sys.argv[1] if len(sys.argv) > 1 else (
        f"/tmp/dress_{model_name}" + ("_crowded" if crowded else ""))
    os.makedirs(work, exist_ok=True)

    rec_dir = os.path.join(work, "records")
    if not os.path.exists(os.path.join(rec_dir, "synth_train_000.tfrecord")):
        make_dataset(work, n_train, n_test, crowded=crowded)
    voc_root = os.path.join(work, "VOCdevkit")

    model, spec = get_network(model_name)
    if not os.environ.get("DR_SKIP_TRAIN"):
        ckpt = os.path.join(work, "vgg16_torch_init.pth")
        if not os.path.exists(ckpt):
            make_torch_vgg_checkpoint(ckpt)
        # From-scratch SSD (plain VGG, no BN) needs warmup + clipping, and
        # the working recipe is size-dependent: SSD-300 takes lr 3e-3 /
        # warmup 1000 (round-2 NOTES), but SSD-512 at bs 14 COLLAPSES to
        # all-background with that LR (mAP 0.0 at loss ~60; round-3 NOTES) —
        # it needs the SSD-paper-style lr 1e-3 with a longer warmup.
        is_ssd = model_name.startswith("ssd")
        is_512 = spec.img_shape[0] > 400
        lr = float(os.environ.get(
            "DR_LR", "0.001" if (not is_ssd or is_512) else "0.003"))
        warmup = int(os.environ.get(
            "DR_WARMUP", "2000" if is_512 else ("1000" if is_ssd else "500")))
        cfg = apply_overrides(
            TrainConfig(),
            [
                f"model={model_name}",
                f"model_dir={work}/model",
                f"data.dataset_dir={rec_dir}",
                "data.file_pattern=synth_train_*.tfrecord",
                f"data.batch_size={batch}",
                f"data.max_boxes={max_boxes}",
                "data.cache_decoded=true",
                f"max_steps={steps}",
                "log_every_steps=100",
                "save_every_steps=5000",
                # the published recipe shape (ref: ron_net.py:95-105,152-155)
                f"optimizer.learning_rate={lr}",
                "optimizer.momentum=0.9",
                "optimizer.learning_rate_decay_type=piecewise",
                f"optimizer.lr_boundaries=[{int(steps * 0.75)}, {int(steps * 0.958)}]",
                "optimizer.lr_factors=[1.0, 0.1, 0.001]",
                f"optimizer.warmup_steps={warmup}",  # from-scratch heads need it
                f"optimizer.clip_global_norm={os.environ.get('DR_CLIP', '25.0' if is_512 else '50.0')}",
                "match.positive_threshold=0.56",
                f"checkpoint_path={ckpt}",
                "checkpoint_format=torch",
                "mesh_shape=[1, 1]",
                "bfloat16=true",
                # This environment's accelerator client leaks host RSS per
                # transfer (see NOTES.md); checkpoint + exit 75 before the
                # OOM killer does it for us. The runner loop retries and
                # auto-resume continues at the saved step.
                "max_host_rss_gb=95",
            ],
        )
        # working canvas comfortably above the model input so crops don't
        # upsample (520 for ssd_512, 400 otherwise — ron/ssd_300 are <=320)
        canvas = 520 if spec.img_shape[0] > 400 else 400
        cfg = replace(cfg, data=replace(cfg.data, working_shape=(canvas, canvas)))
        t0 = time.time()
        Trainer(cfg).train()
        print(f"[train] {steps} steps in {(time.time() - t0) / 60:.1f} min")

    # ---- streaming eval (eval-resize parity path) ----
    infer_model = model.clone(dtype=jax.numpy.bfloat16)
    from ron_tensorflow_tpu.train.checkpoint import CheckpointManager

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jax.numpy.zeros((1, *spec.img_shape, 3)), train=False)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables, step = CheckpointManager(os.path.join(work, "model")).restore_eval(
        zeros["params"], zeros.get("batch_stats", {})
    )
    print(f"[eval] restored step {step}")

    ev = StreamingEvaluator(
        infer_model, spec,
        DetectionConfig(select_threshold=0.01, objectness_threshold=0.03,
                        top_k=200, keep_top_k=100, shared_top_k=1000),
    )
    pcfg = PipelineConfig(batch_size=8, working_shape=spec.img_shape,
                          max_boxes=max_boxes, shuffle=False,
                          keep_difficult=True, eval_resize="WARP_RESIZE")
    test_files = sorted(
        os.path.join(rec_dir, f) for f in os.listdir(rec_dir) if "test" in f
    )

    def eval_batches():
        for hb in PrefetchIterator(
            batch_iterator(test_files, pcfg, epochs=1, drop_remainder=False)
        ):
            yield {
                "image": whiten_np(
                    hb["image01"].astype(np.float32) / 255.0
                    if hb["image01"].dtype == np.uint8
                    else hb["image01"]
                ),
                "gt_labels": hb["gt_labels"],
                "gt_boxes": hb["gt_boxes"],
                "gt_difficult": hb["gt_difficult"],
                "sample_valid": hb["sample_valid"],
            }

    t0 = time.time()
    map07_s, map12_s, aps_s, stats = ev.run(variables, eval_batches(), log_every=0)
    print(f"[streaming] mAP07 {map07_s:.4f}  mAP12 {map12_s:.4f}  "
          f"({stats['sec_per_image'] * 1e3:.1f} ms/img)")

    # ---- realtime eval (official VOCdevkit protocol) ----
    rt = RealtimeEvaluator(
        infer_model, spec,
        # RON: the published ron_eval.py flags (objectness gate 0.95).
        # SSD: streaming-equivalent class-wise NMS — ron_eval's class-blind
        # whole-image path has no reference analogue for SSD and costs
        # ~0.08 mAP (measured, see RealtimeConfig.class_wise).
        RealtimeConfig.for_spec(
            spec,
            objectness_threshold=float(os.environ.get("DR_OBJ_THRESH", "0.95")),
        ),
    )
    t0 = time.time()
    map_rt, aps_rt = rt.evaluate_voc(variables, voc_root, "test",
                                     output_dir=os.path.join(work, "rt_out"))
    rt_time = time.time() - t0
    print(f"[realtime] mAP07 {map_rt:.4f}  ({rt_time / n_test * 1e3:.1f} ms/img)")

    delta = abs(map07_s - map_rt)
    result = {
        "model": model_name, "crowded": crowded,
        "steps": step, "map07_streaming": round(map07_s, 4),
        "map12_streaming": round(map12_s, 4), "map07_realtime": round(map_rt, 4),
        "delta": round(delta, 4),
        "streaming_ms_per_img": round(stats["sec_per_image"] * 1e3, 2),
        "realtime_ms_per_img": round(rt_time / n_test * 1e3, 2),
    }
    with open(os.path.join(work, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ok = map07_s >= 0.5 and delta <= 0.06
    result["ok"] = ok
    _record_rehearsal(result)
    print("DRESS REHEARSAL:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def _record_rehearsal(result):
    """Append the run to the repo-root REHEARSAL_<round>.json artifact so
    judges can diff rehearsal mAPs across rounds without re-running 20k-step
    trainings (VERDICT r4 #7). One JSON file per round holding a list of
    run records, keyed (model, crowded) — a re-run replaces its entry."""
    rnd = os.environ.get("DR_ROUND", "r05")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"REHEARSAL_{rnd}.json",
    )
    runs = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                runs = json.load(f)
        except Exception:
            runs = []
    key = (result["model"], result["crowded"])
    runs = [r for r in runs if (r.get("model"), r.get("crowded")) != key]
    runs.append(result)
    with open(path, "w") as f:
        json.dump(runs, f, indent=1)
    print(f"[rehearsal] recorded -> {path}")


if __name__ == "__main__":
    sys.exit(main())
