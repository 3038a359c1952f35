"""`ron` CLI — train / eval / infer / convert-data / inspect-ckpt / bench.

One typed-config CLI replaces the reference's seven flag-driven driver
scripts (ron_net*.py, eval_ron_network.py, ron_eval.py, eval_ssd_network.py,
tf_convert_data.py, inspect_checkpoint.py — SURVEY §1 L6). Usage:

  python -m ron_tensorflow_tpu.cli train --config cfg.json data.batch_size=32
  python -m ron_tensorflow_tpu.cli eval --model-dir ./model --dataset-dir ./records
  python -m ron_tensorflow_tpu.cli realtime-eval --model-dir ./model --voc-root ./VOCdevkit
  python -m ron_tensorflow_tpu.cli infer --model-dir ./model image1.jpg image2.jpg
  python -m ron_tensorflow_tpu.cli convert-data --voc-root ./VOCdevkit/VOC2007 --output-dir ./records
  python -m ron_tensorflow_tpu.cli inspect-ckpt --model-dir ./model
  python -m ron_tensorflow_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys


def _preset(kind: str, name):
    if not name:
        return None
    from .presets import get_preset

    return get_preset(kind, name)


def cmd_train(args):
    from .config import TrainConfig, load_config
    from .train.trainer import Trainer

    overrides = list(args.overrides)
    if args.model_dir:
        overrides.append(f"model_dir={args.model_dir}")
    if args.dataset_dir:
        overrides.append(f"data.dataset_dir={args.dataset_dir}")
    cfg = load_config(
        TrainConfig, args.config, overrides, base=_preset("train", args.preset)
    )
    Trainer(cfg).train()


def _restore_for_eval(model, spec, model_dir, use_ema=False):
    """Inference-only restore: params/batch_stats (+EMA) straight from the
    checkpoint, independent of the optimizer the run was trained with."""
    import jax

    from .train.checkpoint import CheckpointManager

    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, *spec.img_shape, 3)),
            train=False,
        )
    )
    variables = jax.tree.map(lambda s: jax.numpy.zeros(s.shape, s.dtype), variables)
    mgr = CheckpointManager(model_dir)
    restored, step = mgr.restore_eval(
        variables["params"], variables.get("batch_stats", {}), use_ema=use_ema
    )
    return restored, step


def _maybe_fuse_block1(model, spec, batched: bool = True, bfloat16: bool = True,
                       sharded: bool = False):
    """Enable the Pallas fused block-1 for inference on accelerators (same
    param tree; TPU-only kernel, so CPU keeps the layer composition).
    Only worthwhile for batched eval — at batch 1 the kernel's per-program
    overhead isn't amortized (3.97 vs 3.19 ms fwd, see NOTES.md).
    Skipped when the eval is sharded over a mesh (Pallas custom calls do not
    partition under GSPMD) and when f32 was explicitly requested (the kernel
    computes in bf16)."""
    import jax

    from .models.vgg import fused_block1_supported

    if (
        batched
        and bfloat16
        and not sharded
        and jax.devices()[0].platform != "cpu"
        and fused_block1_supported(*spec.img_shape)
    ):
        return model.clone(fuse_block1=True)
    return model


def cmd_eval(args):
    import numpy as np

    from .config import EvalConfig, load_config
    from .data.pipeline import PipelineConfig, PrefetchIterator, batch_iterator
    from .data.preprocess import whiten_np
    from .data.tfrecord import list_shards
    from .eval import StreamingEvaluator
    from .inference.detector import DetectionConfig
    from .models import get_network

    cfg = load_config(
        EvalConfig, args.config, args.overrides, base=_preset("eval", args.preset)
    )
    model_dir = args.model_dir or cfg.model_dir
    dataset_dir = args.dataset_dir or cfg.data.dataset_dir
    model, spec = get_network(cfg.model)
    if cfg.bfloat16:
        import jax.numpy as jnp

        infer_model = model.clone(dtype=jnp.bfloat16)
    else:
        infer_model = model
    infer_model = _maybe_fuse_block1(
        infer_model, spec, bfloat16=cfg.bfloat16, sharded=cfg.mesh_shape is not None
    )

    files = list_shards(dataset_dir, cfg.data.file_pattern)
    pcfg = PipelineConfig(
        batch_size=cfg.data.batch_size,
        working_shape=spec.img_shape,
        max_boxes=cfg.data.max_boxes,
        shuffle=False,
        keep_difficult=True,
        eval_resize=cfg.resize,  # TF1-parity bilinear + box remap
    )

    def eval_batches():
        # drop_remainder=False: every test image must be scored (the final
        # short batch is padded and masked via sample_valid).
        for hb in PrefetchIterator(
            batch_iterator(files, pcfg, epochs=1, drop_remainder=False)
        ):
            yield {
                "image": whiten_np(hb["image01"]),
                "gt_labels": hb["gt_labels"],
                "gt_boxes": hb["gt_boxes"],
                "gt_difficult": hb["gt_difficult"],
                "sample_valid": hb["sample_valid"],
            }

    mesh = None
    if cfg.mesh_shape is not None:
        from .parallel import make_mesh

        mesh = make_mesh(tuple(cfg.mesh_shape))
    loss_config = None
    if cfg.report_loss:
        if cfg.model.startswith("ssd"):
            from .losses.ssd import SsdLossConfig

            loss_config = SsdLossConfig(
                num_classes=spec.num_classes,
                match_threshold=cfg.match.positive_threshold,
            )
        else:
            from .losses.ron import RonLossConfig

            loss_config = RonLossConfig(num_classes=spec.num_classes)
    ev = StreamingEvaluator(
        infer_model,
        spec,
        DetectionConfig(
            select_threshold=cfg.select_threshold,
            objectness_threshold=cfg.objectness_threshold,
            top_k=cfg.select_top_k,
            keep_top_k=cfg.keep_top_k,
            nms_threshold=cfg.nms_threshold,
            shared_top_k=cfg.shared_top_k,
        ),
        cfg.matching_threshold,
        mesh=mesh,
        loss_config=loss_config,
        loss_match_threshold=cfg.match.positive_threshold,
        loss_ignore_threshold=cfg.match.ignore_threshold,
    )

    # One-shot by default; with wait_for_checkpoints, keep watching the
    # model dir and evaluate every NEW checkpoint (the reference's slim
    # evaluation_loop, ref: eval_ssd_network.py:305-340).
    import time as _time

    from .train.checkpoint import CheckpointManager

    mgr = CheckpointManager(model_dir)
    if not cfg.wait_for_checkpoints and mgr.latest_step() is None:
        raise FileNotFoundError(f"no checkpoint in {model_dir}")
    evaluated_step, n_done = None, 0
    while True:
        latest = mgr.latest_step()
        if latest is not None and latest != evaluated_step:
            variables, step = _restore_for_eval(model, spec, model_dir, cfg.use_ema)
            print(f"[eval] restored step {step}")
            map07, map12, aps07, stats = ev.run(
                variables,
                eval_batches(),
                cfg.max_batches,
                debug_dir=cfg.debug_dir,
                debug_max_images=cfg.debug_max_images,
            )
            for cls, ap in sorted(aps07.items()):
                print(f"  AP07[class {cls:2d}] = {ap:.4f}")
            print(f"mAP (VOC07 metric) = {map07:.4f}")
            print(f"mAP (VOC12 metric) = {map12:.4f}")
            for k in sorted(stats):
                if k.startswith("loss/"):
                    print(f"{k} = {stats[k]:.4f}")
            print(f"eval speed: {stats['sec_per_image']:.4f} sec/image")
            evaluated_step, n_done = step, n_done + 1
        if not cfg.wait_for_checkpoints:
            break
        if cfg.max_evals is not None and n_done >= cfg.max_evals:
            break
        _time.sleep(cfg.eval_interval_secs)
        mgr.reload()  # pick up checkpoints written by the training job


def cmd_realtime_eval(args):
    from .eval import RealtimeEvaluator
    from .inference.detector import RealtimeConfig
    from .models import get_network

    model, spec = get_network(args.model)
    variables, step = _restore_for_eval(model, spec, args.model_dir, args.use_ema)
    model = _maybe_fuse_block1(model, spec, batched=False)  # batch-1 path
    print(f"[ron-eval] restored step {step}")
    rt = RealtimeEvaluator(
        model,
        spec,
        # SSD models get streaming-equivalent class-wise settings (the
        # objectness override is meaningless there and is ignored)
        RealtimeConfig.for_spec(spec, objectness_threshold=args.objectness_threshold),
    )
    mAP, aps = rt.evaluate_voc(
        variables,
        args.voc_root,
        args.set_type,
        max_images=args.max_images,
        output_dir=args.output_dir,
        debug_dir=args.debug_dir,
    )
    for cls, ap in aps.items():
        print(f"AP for {cls} = {ap:.4f}")
    print(f"Mean AP = {mAP:.4f}")


def cmd_infer(args):
    import numpy as np
    from PIL import Image

    from .data.preprocess import whiten
    from .inference.detector import RealtimeConfig, RealtimeDetector
    from .models import get_network
    from .utils.visualization import save_image_with_boxes

    import jax.numpy as jnp

    model, spec = get_network(args.model)
    variables, _ = _restore_for_eval(model, spec, args.model_dir, args.use_ema)
    model = _maybe_fuse_block1(model, spec, batched=False)  # batch-1 path
    det = RealtimeDetector(
        model,
        spec,
        RealtimeConfig.for_spec(spec, objectness_threshold=args.objectness_threshold),
    )
    from .data.resize import tf1_bilinear_resize

    for i, path in enumerate(args.images):
        # TF1-legacy bilinear — the numerics the checkpoints expect
        # (PIL BILINEAR antialises and uses half-pixel centers).
        raw = np.asarray(Image.open(path).convert("RGB"))
        img01 = tf1_bilinear_resize(raw, spec.img_shape) / 255.0
        scores, labels, boxes, valid = det(
            variables, jnp.expand_dims(whiten(jnp.asarray(img01)), 0)
        )
        v = np.asarray(valid[0])
        out = save_image_with_boxes(
            img01,
            np.asarray(boxes[0])[v],
            np.asarray(labels[0])[v],
            np.asarray(scores[0])[v],
            directory=args.output_dir,
            index=i,
        )
        print(f"{path}: {int(v.sum())} detections -> {out}")


def cmd_convert_data(args):
    from .data.convert import convert_voc

    n = convert_voc(
        args.voc_root,
        args.output_dir,
        args.output_name,
        shuffle_seed=args.shuffle_seed,
    )
    print(f"converted {n} samples -> {args.output_dir}")


def cmd_inspect_ckpt(args):
    from .models import get_network
    from .train.checkpoint import inspect_params

    model, spec = get_network(args.model)
    variables, step = _restore_for_eval(model, spec, args.model_dir)
    print(f"step: {step}")
    for line in inspect_params(variables["params"], args.pattern):
        print(line)


def cmd_import_ckpt(args):
    """Convert a reference-framework checkpoint (TF slim / torch / caffe)
    into an orbax model_dir so eval / realtime-eval / infer can restore it
    directly — the reference-user migration path (ref: tf_utils.py:186-244
    warm start; eval_ssd_network.py:209-217 checkpoint restore)."""
    import jax
    import numpy as np

    from .models import get_network
    from .train.checkpoint import (
        CheckpointManager,
        load_torch_checkpoint,
        torch_vgg_to_flat,
        unflatten_params,
        warm_start_params,
    )
    from .train.optimizer import OptimizerConfig, make_optimizer
    from .train.state import create_train_state

    model, spec = get_network(args.model)
    tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, *spec.img_shape, 3), tx
        )
    # RON trees scope the VGG under 'backbone/'; SSD trees keep the convs at
    # top level — aim the importers at whichever this model uses.
    backbone_prefix = "backbone" if "backbone" in state.params else ""

    stats_flat = {}
    if args.format == "tf":
        from .train.tf_checkpoint import (
            TFCheckpointReader,
            slim_ron_to_flat,
            slim_vgg_to_flat,
        )

        tensors = TFCheckpointReader(args.source).load_all()
        if any(n.startswith("reverse_module/") for n in tensors):
            # full RON graph (backbone + reverse modules + heads + BN)
            flat, stats_flat = slim_ron_to_flat(
                tensors, source_scope=args.model_scope or "ron_320_vgg"
            )
        else:
            flat = slim_vgg_to_flat(
                tensors,
                source_scope=args.model_scope or "vgg_16",
                backbone_prefix=backbone_prefix,
            )
    elif args.format == "torch":
        flat = torch_vgg_to_flat(
            load_torch_checkpoint(args.source),
            backbone_prefix=backbone_prefix,
            bgr_to_rgb=args.bgr_to_rgb,
        )
    elif args.format == "caffe":
        from .train.caffe_import import caffe_vgg_to_flat, parse_caffemodel

        flat = caffe_vgg_to_flat(
            parse_caffemodel(args.source),
            backbone_prefix=backbone_prefix,
            bgr_to_rgb=args.bgr_to_rgb,
        )
    else:
        raise ValueError(f"unknown format {args.format!r}")

    params = warm_start_params(state.params, flat, exclude_scopes=())
    batch_stats = state.batch_stats
    if stats_flat:
        batch_stats = unflatten_params(
            {
                **{k: np.asarray(v) for k, v in _flat(batch_stats).items()},
                **{k: np.asarray(v) for k, v in stats_flat.items()},
            }
        )
    state = state.replace(params=params, batch_stats=batch_stats)
    mgr = CheckpointManager(args.model_dir)
    mgr.save(0, jax.device_get(state))
    mgr.wait()
    print(f"imported {args.format} checkpoint -> {args.model_dir} (step 0)")


def _flat(tree):
    from .train.checkpoint import flatten_params

    return flatten_params(tree)


def cmd_bench(args):
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


def _set_platform(platform: str | None):
    """Force the JAX platform BEFORE backend init. Needed because ambient
    site customization may pin an accelerator platform regardless of
    JAX_PLATFORMS (see .claude/skills/verify/SKILL.md)."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ron", description=__doc__)
    p.add_argument(
        "--platform",
        default=None,
        choices=("cpu", "tpu", "axon", None),
        help="force a JAX platform (default: ambient)",
    )
    p.add_argument(
        "--debug-nans",
        action="store_true",
        help="enable jax debug_nans (the tfdbg has_inf_or_nan filter, "
        "ref: ron_net.py:399-402)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a detector")
    t.add_argument("--preset", default=None, help="named recipe (ron_320/ssd_300/ssd_512)")
    t.add_argument("--config", default=None)
    t.add_argument("--model-dir", default=None)
    t.add_argument("--dataset-dir", default=None)
    t.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="streaming mAP eval on TFRecords")
    e.add_argument("--preset", default=None, help="named recipe (ron_320/ssd_300/ssd_512)")
    e.add_argument("--config", default=None)
    e.add_argument("--model-dir", default=None)
    e.add_argument("--dataset-dir", default=None)
    e.add_argument("overrides", nargs="*")
    e.set_defaults(fn=cmd_eval)

    r = sub.add_parser("realtime-eval", help="official VOCdevkit eval")
    r.add_argument("--model", default="ron_320_vgg")
    r.add_argument("--model-dir", required=True)
    r.add_argument("--voc-root", required=True)
    r.add_argument("--set-type", default="test")
    r.add_argument("--max-images", type=int, default=None)
    r.add_argument("--output-dir", default="./output_test")
    r.add_argument("--objectness-threshold", type=float, default=0.95)
    r.add_argument("--use-ema", action="store_true")
    r.add_argument(
        "--debug-dir", default=None,
        help="dump boxed JPEGs of the detections (ref: ron_eval.py:553-555)",
    )
    r.set_defaults(fn=cmd_realtime_eval)

    i = sub.add_parser("infer", help="detect objects in images")
    i.add_argument("images", nargs="+")
    i.add_argument("--model", default="ron_320_vgg")
    i.add_argument("--model-dir", required=True)
    i.add_argument("--output-dir", default="./Debug")
    i.add_argument("--objectness-threshold", type=float, default=0.95)
    i.add_argument("--use-ema", action="store_true")
    i.set_defaults(fn=cmd_infer)

    c = sub.add_parser("convert-data", help="VOC -> TFRecord shards")
    c.add_argument("--voc-root", required=True, help="VOCdevkit/VOC2007 style dir")
    c.add_argument("--output-dir", required=True)
    c.add_argument("--output-name", default="voc_2007_train")
    c.add_argument("--shuffle-seed", type=int, default=None)
    c.set_defaults(fn=cmd_convert_data)

    m = sub.add_parser(
        "import-ckpt", help="convert a TF/torch/caffe checkpoint to a model dir"
    )
    m.add_argument("--format", required=True, choices=("tf", "torch", "caffe"))
    m.add_argument("--source", required=True, help="checkpoint path/prefix")
    m.add_argument("--model", default="ron_320_vgg")
    m.add_argument("--model-dir", required=True)
    m.add_argument("--model-scope", default=None, help="source graph scope name")
    m.add_argument("--bgr-to-rgb", action="store_true")
    m.set_defaults(fn=cmd_import_ckpt)

    k = sub.add_parser("inspect-ckpt", help="list checkpoint tensors")
    k.add_argument("--model", default="ron_320_vgg")
    k.add_argument("--model-dir", required=True)
    k.add_argument("--pattern", default=None)
    k.set_defaults(fn=cmd_inspect_ckpt)

    b = sub.add_parser("bench", help="run the repo benchmark")
    b.set_defaults(fn=cmd_bench)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    _set_platform(args.platform)
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
