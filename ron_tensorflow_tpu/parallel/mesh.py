"""Mesh construction and sharding rules for the RON/SSD detectors.

Parallelism axes:
- 'data': batch (data parallelism) — the only parallelism the reference had,
  in three TF1 flavors (SURVEY §2.3); here it is one `NamedSharding` on the
  batch dimension and XLA inserts the gradient all-reduce over ICI.
- 'model': tensor parallelism over output channels of the widest layers
  (fc6/fc7 and the 512-wide head convs). The reference has no TP at all;
  for VGG-scale models it mostly buys HBM headroom for the heavy (4096-wide)
  variant and demonstrates the mesh plumbing end-to-end.

Under `jit` with these shardings, batch-norm statistics reduce over the
global (all-replica) batch — sync-BN — a documented improvement over the
reference's per-tower BN (ref: nets/ron_vgg_320.py:616-624).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D (data, model) mesh over all devices.

    Default: all devices on 'data', 1 on 'model' — pure DP, the RON sweet
    spot. Pass shape=(n//2, 2) etc. for mixed DP+TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    shape = tuple(shape)
    need = shape[0] * shape[1]
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, axis_names)


# (regex on '/'-joined param path) -> PartitionSpec for the kernel.
# Conv kernels are [kh, kw, in, out]; we shard the out channel on 'model'.
_TP_KERNEL_PATTERNS = (
    r".*backbone/fc6/conv/kernel",
    r".*backbone/fc7/conv/kernel",
    r".*_cls/inception\d_(3x3|1x1)/conv/kernel",
    r".*_objectness/conv/conv/kernel",
    r".*_box/conv/conv/kernel",
)
_TP_BIAS_PATTERNS = tuple(p.replace("kernel", "bias") for p in _TP_KERNEL_PATTERNS)
# BN of a TP-sharded conv is per-output-channel -> its affine params and
# running stats shard on 'model' too (the compiler propagates the conv's
# output sharding onto them; declaring them replicated fails on step 2).
_TP_BN_PARAM_PATTERNS = tuple(
    p.replace("conv/kernel", "bn/(scale|bias)") for p in _TP_KERNEL_PATTERNS
)
_TP_BN_STATS_PATTERNS = tuple(
    p.replace("conv/kernel", "bn/(mean|var)") for p in _TP_KERNEL_PATTERNS
)


def partition_rules():
    """(pattern, spec) rules for model-parallel parameters."""
    rules = [(re.compile(p), P(None, None, None, "model")) for p in _TP_KERNEL_PATTERNS]
    rules += [(re.compile(p), P("model")) for p in _TP_BIAS_PATTERNS]
    rules += [(re.compile(p), P("model")) for p in _TP_BN_PARAM_PATTERNS]
    return rules


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def partition_params(params, mesh: Mesh):
    """NamedSharding tree for the param pytree: TP rules where they match,
    fully replicated otherwise."""
    rules = partition_rules()
    use_tp = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        if use_tp:
            s = _path_str(path)
            for pat, spec in rules:
                if pat.fullmatch(s) and len(spec) <= leaf.ndim:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def partition_batch_stats(batch_stats, mesh: Mesh):
    """NamedSharding tree for BN running stats: 'model'-sharded for BNs
    that follow a TP-sharded conv, replicated otherwise."""
    rules = [(re.compile(p), P("model")) for p in _TP_BN_STATS_PATTERNS]
    use_tp = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        if use_tp:
            s = _path_str(path)
            for pat, spec in rules:
                if pat.fullmatch(s):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, batch_stats)


def partition_opt_state(opt_state, params, mesh: Mesh):
    """NamedSharding tree for an optax state: any params-structured subtree
    (momentum/trace/EMA accumulators) inherits the param shardings; scalar
    leaves (step counts) are replicated.

    Without this, TP>1 runs crash on the SECOND step: the compiler
    propagates the param sharding onto the momentum outputs, which then no
    longer match a replicated in_sharding declaration.
    """
    ptree = jax.tree_util.tree_structure(params)
    pshard = partition_params(params, mesh)

    def is_params_like(node):
        try:
            return jax.tree_util.tree_structure(node) == ptree
        except Exception:
            return False

    def assign(node):
        if is_params_like(node):
            return pshard
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), node)

    return jax.tree.map(assign, opt_state, is_leaf=is_params_like)


def partition_batch(batch, mesh: Mesh):
    """Shard every batch array on its leading (batch) dim over 'data'."""
    def spec_for(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))

    return jax.tree.map(spec_for, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
