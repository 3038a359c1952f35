"""The training driver — config in, trained checkpoints out.

TPU-native replacement for ALL FOUR reference trainers (ron_net.py,
ron_net_multi_gpu.py, ron_net_multi_gpu_optimized.py,
ron_net_multi_gpu_replica.py — SURVEY §2.3): one code path that shards the
same fused step (device augmentation + GT encoding + forward + loss +
backward + update) over a (data, model) mesh. Features:

- warm-start from torch/orbax checkpoints with scope exclude/rename,
  auto-skipped when the model dir already has a checkpoint
  (ref: tf_utils.py:186-244);
- periodic + time-based checkpointing with keep-N retention
  (ref: ron_net.py:395-418);
- JSONL scalar metrics + TensorBoard event files + rolling images/sec
  console logging (ref: ron_net.py:331-372 summaries);
- opt-in augmented-batch/GT debug image dumps — the reference's primary
  matching-bug debugging tool (ref: ssd_vgg_preprocessing.py:86-94,
  eval_ron_network.py:240-247, draw_toolbox.py:48-101);
- NaN guard on the loss (the tfdbg has_inf_or_nan equivalent,
  ref: ron_net.py:399-402).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import TrainConfig, print_config
from ..data.pipeline import PipelineConfig, PrefetchIterator, batch_iterator
from ..data.preprocess import PreprocessConfig, train_augment_batch
from ..data.tfrecord import list_shards
from ..models import get_network
from ..ops.encode import TargetEncoder
from ..parallel import (
    make_mesh,
    partition_batch,
    partition_batch_stats,
    partition_opt_state,
    partition_params,
)
from ..utils.summaries import MetricsWriter
from ..utils.profiling import StepTimer
from .checkpoint import (
    CheckpointManager,
    load_torch_checkpoint,
    torch_vgg_to_flat,
    warm_start_params,
)
from .optimizer import make_optimizer
from .state import TrainState, create_train_state, make_train_step


def _host_rss_gb() -> float:
    """This process's resident set size in GB (Linux)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return 0.0


class Trainer:
    def __init__(self, config: TrainConfig):
        self.config = config
        self.model, self.spec = get_network(config.model)
        if config.bfloat16:
            self.model = self.model.clone(dtype=jnp.bfloat16)
        if config.bn_fast_normalize:
            from ..models.layers import set_bn_fast_normalize

            set_bn_fast_normalize(True)
        if config.s2d_stem:
            from ..models.vgg import s2d_stem_supported

            if s2d_stem_supported(*self.spec.img_shape):
                self.model = self.model.clone(s2d_stem=True)
        elif config.fuse_block1:
            from ..models.vgg import fused_block1_supported

            n_mesh = (
                config.mesh_shape[0] * config.mesh_shape[1]
                if config.mesh_shape
                else jax.device_count()
            )
            # TPU-only kernel; Pallas custom calls do not partition under
            # GSPMD, so only the single-device (per-process) case fuses.
            if (
                config.bfloat16
                and n_mesh == 1
                and jax.devices()[0].platform != "cpu"
                and fused_block1_supported(*self.spec.img_shape)
            ):
                self.model = self.model.clone(fuse_block1=True)
        self.encoder = TargetEncoder(
            self.spec.anchor_layout(),
            self.spec.img_shape,
            config.match.positive_threshold,
            config.match.ignore_threshold,
            self.spec.prior_scaling,
        )
        self.tx = make_optimizer(config.optimizer)
        variant = config.augment_variant
        if variant == "auto":
            variant = "ssd" if config.model.startswith("ssd") else "ron"
        self.preprocess_config = PreprocessConfig(
            out_shape=self.spec.img_shape, variant=variant
        )

        # SSD models train with the hard-negative-mining loss family.
        loss_config = config.loss
        if config.model.startswith("ssd"):
            from ..losses.ssd import SsdLossConfig

            loss_config = SsdLossConfig(
                num_classes=self.spec.num_classes,
                match_threshold=config.match.positive_threshold,
            )

        # One fused step: augmentation -> encoding -> fwd/bwd -> update.
        base_step = make_train_step(
            self.model, self.encoder, self.tx, loss_config, config.ema_decay
        )

        def full_step(state: TrainState, host_batch: Dict, rng: jax.Array):
            k_aug, k_loss = jax.random.split(rng)
            image01 = host_batch["image01"]
            if image01.dtype == jnp.uint8:
                # uint8 transport (4x less host->device traffic); normalize
                # on device.
                image01 = image01.astype(jnp.float32) / 255.0
            image, boxes, labels, valid = train_augment_batch(
                k_aug,
                image01,
                host_batch["gt_boxes"],
                host_batch["gt_labels"],
                host_batch["gt_valid"],
                self.preprocess_config,
            )
            batch = {
                "image": image,
                "gt_labels": labels,
                "gt_boxes": boxes,
                "gt_valid": valid,
            }
            return base_step(state, batch, k_loss)

        self._full_step = full_step
        self._ckpt = CheckpointManager(
            config.model_dir, max_to_keep=config.max_to_keep
        )

    # ------------------------------------------------------------------ #

    def init_state(self) -> TrainState:
        cfg = self.config
        input_shape = (cfg.data.batch_size, *self.spec.img_shape, 3)
        state = create_train_state(
            self.model,
            jax.random.PRNGKey(cfg.seed),
            input_shape,
            self.tx,
            ema=cfg.ema_decay is not None,
        )
        if self._ckpt.has_checkpoint():
            # auto-resume (ref: tf_utils.py:198-203)
            state = self._ckpt.restore(state)
            print(f"[trainer] resumed from step {int(state.step)}")
            return state
        if cfg.checkpoint_path:
            state = state.replace(params=self._warm_start(state.params))
        return state

    def _warm_start(self, params):
        cfg = self.config
        # RON trees scope the VGG under 'backbone/'; SSD trees keep the VGG
        # convs at top level (slim-rule naming parity) — aim the importers
        # at whichever this model uses.
        backbone_prefix = "backbone" if "backbone" in params else ""
        if cfg.checkpoint_format == "torch":
            sd = load_torch_checkpoint(cfg.checkpoint_path)
            flat = torch_vgg_to_flat(
                sd,
                backbone_prefix=backbone_prefix,
                bgr_to_rgb=cfg.checkpoint_bgr_to_rgb,
            )
        elif cfg.checkpoint_format == "tf":
            from .tf_checkpoint import TFCheckpointReader, slim_vgg_to_flat

            reader = TFCheckpointReader(cfg.checkpoint_path)
            flat = slim_vgg_to_flat(
                reader.load_all(),
                source_scope=cfg.checkpoint_model_scope or "vgg_16",
                backbone_prefix=backbone_prefix,
            )
        elif cfg.checkpoint_format == "caffe":
            from .caffe_import import caffe_vgg_to_flat, parse_caffemodel

            flat = caffe_vgg_to_flat(
                parse_caffemodel(cfg.checkpoint_path),
                backbone_prefix=backbone_prefix,
                bgr_to_rgb=cfg.checkpoint_bgr_to_rgb,
            )
        else:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(cfg.checkpoint_path)
            from .checkpoint import flatten_params

            flat = flatten_params(restored)
        rename = (
            {"backbone": cfg.checkpoint_model_scope}
            if cfg.checkpoint_model_scope
            else None
        )
        return warm_start_params(
            params,
            flat,
            exclude_scopes=cfg.checkpoint_exclude_scopes,
            rename_map=rename,
        )

    # ------------------------------------------------------------------ #

    def make_batches(self, epochs=None) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.config
        files = list_shards(cfg.data.dataset_dir, cfg.data.file_pattern)
        if not files:
            raise FileNotFoundError(
                f"no shards matching {cfg.data.file_pattern!r} in {cfg.data.dataset_dir!r}"
            )
        pcfg = PipelineConfig(
            batch_size=cfg.data.batch_size,
            working_shape=cfg.data.working_shape,
            max_boxes=cfg.data.max_boxes,
            shuffle=cfg.data.shuffle,
            keep_difficult=cfg.data.keep_difficult,
            num_workers=cfg.data.num_workers,
            worker_index=cfg.data.worker_index,
            seed=cfg.seed,
            cache_decoded=cfg.data.cache_decoded,
            output_dtype="uint8",  # quarter the host->device batch traffic
        )
        if cfg.data.use_grain:
            from ..data.grain_pipeline import GrainBatches

            return GrainBatches(files, pcfg, epochs=epochs)
        return PrefetchIterator(batch_iterator(files, pcfg, epochs=epochs))

    def train(self, max_steps: Optional[int] = None, batches=None) -> TrainState:
        cfg = self.config
        max_steps = max_steps or cfg.max_steps
        n_proc = jax.process_count()
        primary = jax.process_index() == 0
        if primary:
            print_config(cfg)

        mesh = make_mesh(cfg.mesh_shape)
        state = self.init_state()

        params_shardings = partition_params(state.params, mesh)
        state_shardings = state.replace(
            step=NamedSharding(mesh, P()),
            params=params_shardings,
            batch_stats=partition_batch_stats(state.batch_stats, mesh),
            # momentum/EMA follow the param sharding — with TP>1 the
            # compiler propagates it onto the step outputs, and declaring
            # them replicated would fail on the second step.
            opt_state=partition_opt_state(state.opt_state, state.params, mesh),
            ema_params=params_shardings if state.ema_params is not None else None,
        )
        if n_proc > 1:
            # Multi-process (the reference's between-graph rig,
            # ron_net_multi_gpu_replica.py:319-448): every process holds the
            # SAME host state (identical seed / checkpoint on shared FS) and
            # serves its devices' slices of the global arrays.
            from ..parallel import host_tree_to_global

            state = host_tree_to_global(jax.device_get(state), state_shardings)
        else:
            state = jax.device_put(state, state_shardings)
        # donate the state: params/opt_state/EMA update in place instead of
        # allocating (and copying) a fresh ~3x-params footprint every step.
        # out_shardings pins the new state to the SAME shardings as the
        # input — without it the compiler is free to re-shard outputs (e.g.
        # input-channel-shard a consumer of a TP layer), and the next step's
        # in_shardings declaration would no longer match.
        step_fn = jax.jit(
            self._full_step,
            in_shardings=(state_shardings, None, None),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        )

        writer = MetricsWriter(cfg.model_dir) if primary else None
        tb = None
        if cfg.tensorboard and primary:
            from ..utils.tensorboard import TensorBoardWriter

            tb = TensorBoardWriter(cfg.model_dir)
        timer = StepTimer()
        last_save_time = time.time()
        it = batches if batches is not None else self.make_batches()

        step = int(state.step)
        # Grain input-position resume: continue at the next unseen sample
        # (the reference restarted the input stream from scratch on resume).
        # Each process saves/restores its OWN position file — the per-process
        # shard streams are independent (worker_index is baked into the
        # sampler), so restoring process 0's index onto process k would put
        # every process on shard 0's stream.
        suffix = "" if n_proc == 1 else f"_{jax.process_index()}"
        input_state_path = os.path.join(cfg.model_dir, f"input_state{suffix}.json")
        if (
            step > 0
            and hasattr(it, "restore_state_json")
            and os.path.exists(input_state_path)
        ):
            with open(input_state_path) as f:
                it.restore_state_json(f.read())
            print("[trainer] input pipeline position restored")
        def place(host_batch):
            batch = {
                "image01": host_batch["image01"],
                "gt_boxes": host_batch["gt_boxes"],
                "gt_labels": host_batch["gt_labels"],
                "gt_valid": host_batch["gt_valid"],
            }
            if n_proc > 1:
                # per-process local batch -> global array sharded on 'data'
                # (data.batch_size is the LOCAL batch in multi-process runs)
                from ..parallel import host_local_to_global

                return host_local_to_global(batch, mesh)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            return jax.device_put(batch, partition_batch(batch, mesh))

        if n_proc == 1 and not hasattr(it, "state_json"):
            # Upload one batch ahead on a background thread so the
            # host->device transfer overlaps the device step. Skipped for
            # checkpointable (grain) inputs — read-ahead would desync the
            # saved input position from the consumed position — and for
            # multi-process runs, where placement is collective.
            from ..data.pipeline import DevicePrefetcher

            it = DevicePrefetcher(it, place)
            place = lambda b: b  # already placed

        while step < max_steps:
            try:
                host_batch = next(it)
            except StopIteration:
                print("[trainer] input exhausted")
                break
            batch = place(host_batch)
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step)
            state, metrics = step_fn(state, batch, rng)
            timer.tick()
            step += 1

            if cfg.log_every_steps and step % cfg.log_every_steps == 0:
                loss = float(metrics["loss/total"])
                if not np.isfinite(loss):
                    raise FloatingPointError(f"non-finite loss at step {step}: {loss}")
                if primary:
                    scalars = {k: float(v) for k, v in metrics.items()}
                    scalars["images_per_sec"] = timer.images_per_sec(
                        cfg.data.batch_size * n_proc
                    )
                    writer.write(step, scalars)
                    if tb is not None:
                        tb.scalars(scalars, step)
                    print(
                        f"[trainer] step {step} loss {loss:.4f} "
                        f"({scalars['images_per_sec']:.1f} img/s)"
                    )

            if (
                cfg.dump_debug_images_every
                and primary
                and n_proc == 1  # batch is a local single-process array
                and step % cfg.dump_debug_images_every == 0
            ):
                self._dump_debug_image(batch, rng, step, tb)

            time_due = time.time() - last_save_time > cfg.save_interval_secs
            if n_proc > 1:
                # orbax save is collective — every process must make the
                # same decision. Clocks drift, so the primary's time_due is
                # broadcast (checked every 16 steps to bound the cost; the
                # reference saved time-based from the chief only,
                # ref: ron_net.py:415).
                if step % 16 == 0:
                    from jax.experimental import multihost_utils

                    time_due = bool(
                        multihost_utils.broadcast_one_to_all(
                            np.int32(time_due if primary else 0)
                        )
                    )
                else:
                    time_due = False
            if (
                cfg.max_host_rss_gb
                and n_proc == 1
                and _host_rss_gb() > cfg.max_host_rss_gb  # ~10us /proc read
            ):
                # Controlled restart point: save at THIS step and exit 75 so
                # a supervisor restarts us; auto-resume continues from here
                # instead of losing up to save_every_steps to a SIGKILL.
                self._ckpt.save(step, jax.device_get(state))
                if hasattr(it, "state_json"):
                    with open(input_state_path, "w") as f:
                        f.write(it.state_json())
                self._ckpt.wait()
                print(
                    f"[trainer] host RSS {_host_rss_gb():.1f} GB > "
                    f"{cfg.max_host_rss_gb} GB limit: saved step {step}, "
                    "exiting 75 (EX_TEMPFAIL) for supervisor restart"
                )
                raise SystemExit(75)

            if step % cfg.save_every_steps == 0 or time_due or step >= max_steps:
                # Multi-process: hand orbax the GLOBAL jax.Arrays — with
                # TP>1 across processes the shards are not fully addressable
                # and jax.device_get would fail; orbax writes each process's
                # addressable shards (and copies out of device buffers
                # before returning, so donation on the next step is safe).
                self._ckpt.save(step, state if n_proc > 1 else jax.device_get(state))
                if hasattr(it, "state_json"):  # every process: own shard position
                    with open(input_state_path, "w") as f:
                        f.write(it.state_json())
                last_save_time = time.time()

        self._ckpt.wait()
        if writer is not None:
            writer.close()
        if tb is not None:
            tb.close()
        return state

    def _dump_debug_image(self, batch: Dict, rng: jax.Array, step: int, tb) -> None:
        """Dump sample 0 of the augmented batch with its (augmented) GT boxes
        — the reference's ./Debug/<n>.jpg hook (ref: eval_ron_network.py:
        240-247, draw_toolbox.py:48-101). Re-runs the augmentation with the
        step's aug key, so the image is exactly what the train step saw."""
        from ..data.preprocess import train_augment_batch, unwhiten
        from ..utils.visualization import draw_boxes

        k_aug, _ = jax.random.split(rng)
        image01 = batch["image01"]
        if image01.dtype == jnp.uint8:
            image01 = image01.astype(jnp.float32) / 255.0
        image, boxes, labels, valid = train_augment_batch(
            k_aug,
            image01,
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_valid"],
            self.preprocess_config,
        )
        img01 = np.clip(np.asarray(unwhiten(image[0].astype(jnp.float32))), 0.0, 1.0)
        lab = np.where(np.asarray(valid[0]), np.asarray(labels[0]), 0)
        pil = draw_boxes(img01, np.asarray(boxes[0]), lab)
        debug_dir = os.path.join(self.config.model_dir, "debug")
        os.makedirs(debug_dir, exist_ok=True)
        pil.save(os.path.join(debug_dir, f"step_{step:06d}.jpg"))
        if tb is not None:
            tb.image("train/augmented_gt", np.asarray(pil), step)
