"""Typed configuration system.

Replaces the reference's ~40 duplicated `tf.app.flags` per driver
(ref: ron_net.py:52-180, eval_ron_network.py:40-135, SURVEY §5 config
notes) with nested dataclasses that load from JSON files and accept
`key=value` dotted overrides. Defaults reproduce the published training
recipe (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence, Tuple

from .losses.ron import RonLossConfig
from .train.optimizer import OptimizerConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset_dir: str = ""
    dataset_name: str = "pascalvoc_2007_2012"
    split_name: str = "train"
    file_pattern: str = "voc_20??_train_*.tfrecord"
    batch_size: int = 14  # ref: ron_net.py:152-153
    working_shape: Tuple[int, int] = (512, 512)
    max_boxes: int = 56
    shuffle: bool = True
    keep_difficult: bool = False
    num_workers: int = 1
    worker_index: int = 0
    # cache decoded working-canvas images in host RAM (uint8) — removes the
    # JPEG-decode bottleneck from epochs 2+ (VOC07+12 @512^2 is ~17 GB)
    cache_decoded: bool = True
    # Grain-backed pipeline (data/grain_pipeline.py): globally deterministic
    # sample order, index-level per-process sharding, and input-position
    # checkpointing (resume continues at the next unseen sample).
    use_grain: bool = False


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    # ref: ron_net.py:56-63 (train) / eval_ron_network.py:64-90 (eval)
    positive_threshold: float = 0.56
    ignore_threshold: float = 0.3


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: str = "ron_320_vgg"
    model_dir: str = "./model"
    max_steps: int = 120000  # ref: README.md:34 (~120k)
    data: DataConfig = DataConfig()
    match: MatchConfig = MatchConfig()
    loss: RonLossConfig = RonLossConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    seed: int = 0
    # Train augmentation chain: 'auto' = the model family's reference path
    # (RON expand+patch chain for ron_*, the distinct SSD min-object-covered
    # crop for ssd_*, ref: ssd_vgg_preprocessing.py:233-295 vs :297-356);
    # 'ron' / 'ssd' force one.
    augment_variant: str = "auto"
    bfloat16: bool = True
    # Train-time BatchNorm fast path: keep f32 statistics but run the
    # normalize as a fused scale/shift in the activation dtype (bf16) —
    # avoids materializing f32 copies of conv outputs. Only meaningful with
    # bfloat16=true; deviation from f32 normalize is bf16-level noise
    # (see models/layers.py set_bn_fast_normalize).
    bn_fast_normalize: bool = False
    # Train with the fused Pallas block-1 kernel (custom recompute VJP —
    # block-1 activations are never stored; kernels/fused_conv_pool.py).
    # Only supported at TPU-friendly input shapes (vgg.fused_block1_supported)
    # and only profitable at 320²-class resolutions; ignored on CPU meshes.
    fuse_block1: bool = False
    # Train with block 1 in the 2x2 polyphase (space-to-depth) domain —
    # exact reindexing of the same parameters, pure XLA so it partitions
    # under GSPMD meshes (unlike fuse_block1). Fixes the channel-starved
    # stem's MXU efficiency (see models/vgg.py s2d_block1). Needs even
    # input dims (vgg.s2d_stem_supported).
    s2d_stem: bool = False
    log_every_steps: int = 10  # ref: log_every_n_steps
    save_every_steps: int = 2000
    save_interval_secs: float = 7200.0  # ref: ron_net.py:415
    max_to_keep: int = 5  # ref: ron_net.py:396
    ema_decay: Optional[float] = None
    # warm start (ref: ron_net.py:125-148 fine-tuning flags)
    checkpoint_path: Optional[str] = None
    checkpoint_format: str = "torch"  # torch | orbax
    checkpoint_exclude_scopes: Tuple[str, ...] = ("reverse",)
    checkpoint_model_scope: Optional[str] = None  # rename source scope
    checkpoint_bgr_to_rgb: bool = False
    # mesh
    mesh_shape: Optional[Tuple[int, int]] = None  # None => (n_devices, 1)
    # Failure containment: if this process's host RSS exceeds the limit,
    # save a checkpoint at the current step and exit with code 75
    # (EX_TEMPFAIL) so a supervisor can restart cleanly — auto-resume picks
    # up at the saved step. Guards long runs against host-side memory
    # growth outside the trainer's control (e.g. per-transfer leaks in an
    # accelerator client library) turning into a SIGKILL with up to
    # save_every_steps of lost work. 0 = disabled.
    max_host_rss_gb: float = 0.0
    # observability (ref: ron_net.py:331-372 summaries; ssd_vgg_preprocessing
    # :86-94 + draw_toolbox.py debug image dumps)
    tensorboard: bool = True  # events.out.tfevents.* next to metrics.jsonl
    # Every N steps, dump sample 0 of the augmented batch with its encoded GT
    # boxes to <model_dir>/debug/ and as a TB image summary. 0 = off.
    dump_debug_images_every: int = 0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    model: str = "ron_320_vgg"
    model_dir: str = "./model"
    data: DataConfig = DataConfig(
        dataset_name="pascalvoc_2007", split_name="test",
        file_pattern="voc_2007_test_*.tfrecord", batch_size=8, shuffle=False,
        keep_difficult=True,
    )
    match: MatchConfig = MatchConfig(positive_threshold=0.5)
    # detection pipeline (ref: eval_ron_network.py:64-75)
    select_threshold: float = 0.01
    objectness_threshold: float = 0.03
    select_top_k: int = 200
    keep_top_k: int = 100
    nms_threshold: float = 0.4
    # Whole-image candidate preselection (TPU speed knob; 0 = strict
    # reference semantics — the default). K=1000 was mAP-lossless on the
    # sparse-scene A/B but measured -0.0005 mAP07 on the crowded-rehearsal
    # A/B (NOTES.md round 5): preselection drops crowd candidates, so eval
    # runs exact by default and K>0 is an opt-in serving knob.
    shared_top_k: int = 0
    matching_threshold: float = 0.5
    # Report the model losses on eval batches alongside mAP, like the
    # reference's streaming eval graph (ref: eval_ron_network.py:212-220).
    # Uses match.positive_threshold (eval default 0.5) for GT encoding.
    report_loss: bool = True
    max_batches: Optional[int] = None
    use_ema: bool = False
    # bf16 inference (matches TrainConfig.bfloat16 and the bench path). Also
    # sidesteps a libtpu crash for SSD f32 fused forward+postprocess — see
    # DetectionConfig.split_apply for the f32 escape hatch.
    bfloat16: bool = True
    # Multi-chip data-parallel eval: shard each batch over a (data, model)
    # mesh (None = single device, the reference's behavior). batch_size must
    # be divisible by the data-axis size.
    mesh_shape: Optional[Tuple[int, int]] = None
    # Continuous eval: keep watching model_dir and evaluate every NEW
    # checkpoint (ref: eval_ssd_network.py:101,305-340
    # `wait_for_checkpoints` + slim evaluation_loop).
    wait_for_checkpoints: bool = False
    eval_interval_secs: float = 60.0
    max_evals: Optional[int] = None  # stop after N evaluations (None = forever)
    # Debug boxed-JPEG dumps of post-NMS detections (the reference's
    # in-graph py_func hook, ref: eval_ron_network.py:240-247). None = off.
    debug_dir: Optional[str] = None
    debug_max_images: int = 64
    # Eval resize strategy (ref: eval_ssd_network.py `eval_resize_option` +
    # ssd_vgg_preprocessing.py:358-425): WARP_RESIZE (default) |
    # CENTRAL_CROP | PAD_AND_RESIZE. ('NONE' needs the realtime evaluator.)
    resize: str = "WARP_RESIZE"


def _coerce(value: str, field_type) -> Any:
    if field_type in (int, "int", Optional[int]):
        return int(value)
    if field_type in (float, "float", Optional[float]):
        return float(value)
    if field_type in (bool, "bool"):
        return value.lower() in ("1", "true", "yes")
    if field_type in (str, "str", Optional[str]):
        return value
    try:
        return json.loads(value)
    except json.JSONDecodeError:
        return value


def apply_overrides(cfg, overrides: Sequence[str]):
    """Apply 'a.b.c=value' overrides to a (possibly nested) frozen dataclass."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        cfg = _apply_one(cfg, parts, value)
    return cfg


def _apply_one(cfg, parts, value):
    if len(parts) == 1:
        fields = {f.name: f for f in dataclasses.fields(cfg)}
        if parts[0] not in fields:
            raise KeyError(f"unknown config field {parts[0]!r} on {type(cfg).__name__}")
        ftype = fields[parts[0]].type
        return dataclasses.replace(cfg, **{parts[0]: _coerce(value, ftype)})
    child = getattr(cfg, parts[0])
    return dataclasses.replace(cfg, **{parts[0]: _apply_one(child, parts[1:], value)})


def load_config(
    cls, path: Optional[str] = None, overrides: Sequence[str] = (), base=None
):
    """Build a config from an optional base (preset) + JSON file + dotted
    overrides; the file replaces the base, overrides apply last."""
    cfg = base if base is not None else cls()
    if path:
        with open(path) as f:
            data = json.load(f)
        cfg = _from_dict(cls, data)
    return apply_overrides(cfg, overrides)


def _from_dict(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.default) and isinstance(v, dict):
            kwargs[f.name] = _from_dict(type(f.default), v)
        else:
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def print_config(cfg, stream=None) -> None:
    """Console + file config dump (ref: tf_utils.print_configuration:61-89)."""
    text = json.dumps(config_to_dict(cfg), indent=2, default=str)
    print(text, file=stream)
