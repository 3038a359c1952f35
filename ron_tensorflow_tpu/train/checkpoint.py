"""Checkpointing, auto-resume, warm-start and checkpoint inspection.

TPU-native replacement for the reference's Saver machinery:
- periodic save / keep-N / resume: orbax CheckpointManager replaces
  `tf.train.Saver(max_to_keep=5, keep_checkpoint_every_n_hours=2)` +
  Supervisor timers (ref: ron_net.py:395-418);
- warm-start with scope exclusion + scope renaming + missing-variable
  tolerance replaces `tf_utils.get_init_fn` (ref: tf_utils.py:186-244) —
  here a path-pattern filter + rename map over param pytrees;
- auto-resume: warm-start is skipped when the model dir already has a
  checkpoint (ref: tf_utils.py:198-203);
- PyTorch VGG import replaces the pytorch->keras->IR->TF pipeline
  (ref: convert_pytorch_vgg.py, pytorch2keras/*) with a direct
  state_dict -> flax params mapping (OIHW -> HWIO transpose, optional
  BGR->RGB first-conv flip for checkpoints trained on BGR input,
  ref: README.md:36);
- `inspect_checkpoint` replaces the inspection CLI
  (ref: inspect_checkpoint.py:32-131).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np


def _np_restore_args(item):
    """RestoreArgs tree requesting plain numpy for every leaf — reads the
    full assembled array regardless of how the checkpoint was sharded at
    save time."""
    import orbax.checkpoint as ocp

    return jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)


def flatten_params(params) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[key] = leaf
    return flat


def unflatten_params(flat: Dict[str, Any]):
    tree: Dict[str, Any] = {}
    for key, leaf in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


# --------------------------------------------------------------------------- #
# Orbax-backed train-state checkpointing
# --------------------------------------------------------------------------- #


class CheckpointManager:
    """Thin orbax wrapper with the reference's retention policy."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 5,  # ref: ron_net.py:396
        save_interval_steps: int = 1,
    ):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like, step: Optional[int] = None):
        """Restore the full state as host numpy arrays.

        Checkpoints may have been written from sharded (even non-fully-
        addressable) jax.Arrays by a multi-process TP run — restoring with
        explicit numpy RestoreArgs reads the assembled full arrays without
        needing a device sharding (StandardRestore would demand one)."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        path = os.path.join(self._dir, str(step), "default")
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=state_like, restore_args=_np_restore_args(state_like)
            ),
        )

    def restore_eval(
        self,
        params_like,
        batch_stats_like,
        step: Optional[int] = None,
        use_ema: bool = False,
    ):
        """Restore only what inference needs — params, batch_stats and (if
        requested and present) ema_params — independent of the optimizer
        chain the checkpoint was trained with (opt_state is not touched, so
        eval never needs the training OptimizerConfig).

        Returns (variables_dict, step).
        """
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        path = os.path.join(self._dir, str(step), "default")
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())

        def attempt(item):
            return ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=item,
                    restore_args=_np_restore_args(item),
                    partial_restore=True,
                ),
            )

        base = {"params": params_like, "batch_stats": batch_stats_like}
        if use_ema:
            try:
                out = attempt({**base, "ema_params": params_like})
                params = out["ema_params"]
                if params is None:  # saved without EMA
                    params = out["params"]
                return {"params": params, "batch_stats": out["batch_stats"]}, step
            except (ValueError, KeyError):
                pass  # checkpoint predates EMA — fall through to raw params
        out = attempt(base)
        return {"params": out["params"], "batch_stats": out["batch_stats"]}, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def reload(self) -> None:
        """Re-scan the directory — orbax caches the step list, so external
        writers (a concurrent training job) are invisible without this."""
        self._mgr.reload()

    def has_checkpoint(self) -> bool:
        return self.latest_step() is not None

    def wait(self):
        self._mgr.wait_until_finished()


# --------------------------------------------------------------------------- #
# Warm start (fine-tune restore)
# --------------------------------------------------------------------------- #


def warm_start_params(
    params,
    restore_flat: Dict[str, np.ndarray],
    exclude_scopes: Sequence[str] = (),
    rename_map: Optional[Dict[str, str]] = None,
    ignore_missing: bool = True,
    verbose: bool = True,
):
    """Overlay restored tensors onto freshly-initialized params.

    Args:
      params: target param pytree (values replaced where matched).
      restore_flat: flat {'a/b/kernel': array} source tensors.
      exclude_scopes: path-prefix scopes NOT to restore (the reference
        excludes 'reverse_module' when loading classification weights,
        ref: ron_net.py:139-141 + tf_utils.py:205-219).
      rename_map: {target_prefix: source_prefix} scope renames (the
        model_name -> 'vgg_16' trick, ref: tf_utils.py:221-229).
      ignore_missing: tolerate source tensors absent for a target
        (ref: tf_utils.py:231-240).
    """
    flat = flatten_params(params)
    out = dict(flat)
    n_restored, missing = 0, []
    for key, value in flat.items():
        if any(key.startswith(s) or re.search(s, key) for s in exclude_scopes):
            continue
        src_key = key
        if rename_map:
            for tgt_prefix, src_prefix in rename_map.items():
                if key.startswith(tgt_prefix):
                    src_key = src_prefix + key[len(tgt_prefix):]
                    break
        if src_key in restore_flat:
            src = np.asarray(restore_flat[src_key])
            if src.shape != value.shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {src.shape} vs model {value.shape}"
                )
            out[key] = src.astype(np.asarray(value).dtype)
            n_restored += 1
        else:
            missing.append(key)
    if missing and not ignore_missing:
        raise KeyError(f"missing tensors for: {missing[:10]}...")
    if verbose:
        print(f"[warm-start] restored {n_restored} tensors, "
              f"{len(missing)} left at init")
    return unflatten_params(out)


# PyTorch torchvision-style VGG16 conv layer indices (features.N) in order.
_TORCH_VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_OUR_VGG16_CONV_NAMES = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
    "conv5_3",
)


def torch_vgg_to_flat(
    state_dict: Dict[str, "np.ndarray"],
    backbone_prefix: str = "backbone",
    bgr_to_rgb: bool = False,
) -> Dict[str, np.ndarray]:
    """Map a PyTorch VGG16(-reducedfc) state_dict to our flat param names.

    Accepts torchvision ('features.N.weight') and ssd.pytorch
    ('vgg.N.weight', fc6/fc7 at indices 31/33) layouts. Conv weights
    transpose OIHW -> HWIO. With `bgr_to_rgb`, the first conv's input
    channels are reversed so a BGR-trained checkpoint consumes RGB input
    (the reference's caffe importer does the same flip,
    ref: nets/caffe_scope.py:33-39).
    """
    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    prefix = "features." if any(k.startswith("features.") for k in sd) else "vgg."

    flat: Dict[str, np.ndarray] = {}

    # SSD trees keep the VGG convs at top level (no 'backbone' scope) —
    # backbone_prefix='' emits unprefixed keys.
    pfx = f"{backbone_prefix}/" if backbone_prefix else ""

    def put_conv(our_name: str, w: np.ndarray, b: np.ndarray, flip_input=False):
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        if flip_input:
            w = w[:, :, ::-1, :]
        flat[f"{pfx}{our_name}/conv/kernel"] = w
        flat[f"{pfx}{our_name}/conv/bias"] = b

    for i, (idx, name) in enumerate(zip(_TORCH_VGG16_CONV_IDS, _OUR_VGG16_CONV_NAMES)):
        wk, bk = f"{prefix}{idx}.weight", f"{prefix}{idx}.bias"
        if wk not in sd:
            continue
        put_conv(name, sd[wk], sd[bk], flip_input=bgr_to_rgb and i == 0)

    # ssd.pytorch reduced fc6/fc7 live at vgg.31 / vgg.33
    for idx, name in ((31, "fc6"), (33, "fc7")):
        wk, bk = f"{prefix}{idx}.weight", f"{prefix}{idx}.bias"
        if wk in sd:
            put_conv(name, sd[wk], sd[bk])
    return flat


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


# --------------------------------------------------------------------------- #
# Inspection
# --------------------------------------------------------------------------- #


def inspect_params(params, pattern: Optional[str] = None) -> List[str]:
    """Human-readable tensor listing (name, shape, dtype, l2 norm) —
    the `inspect_checkpoint.py` capability."""
    lines = []
    for key, leaf in sorted(flatten_params(params).items()):
        if pattern and not re.search(pattern, key):
            continue
        arr = np.asarray(leaf)
        lines.append(
            f"{key:70s} {str(arr.shape):20s} {str(arr.dtype):10s} "
            f"l2={float(np.sqrt((arr.astype(np.float64) ** 2).sum())):.4g}"
        )
    return lines
