"""Multi-host (multi-process) training support.

TPU-native replacement for the reference's between-graph PS architecture
(ref: ron_net_multi_gpu_replica.py:319-448): no parameter servers, no gRPC
done-queue shutdown protocol — every process runs the SAME program; JAX/XLA
collectives over ICI/DCN do the synchronization, and recovery is
checkpoint-based (orbax restore on restart) instead of
`tf.train.Supervisor` session recovery.

Input sharding: each process reads its own slice of the shard files
(`data.num_workers = process_count, data.worker_index = process_index`),
replacing the sorted-glob slicing of datasets/pascalvoc_common.py:76-88,
and assembles its host-local batch into a global jax.Array.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_index, process_count) — the worker_index/num_workers for
    input sharding."""
    return jax.process_index(), jax.process_count()


def host_local_to_global(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict:
    """Assemble per-host batches into global arrays sharded on 'data'.

    Each process holds batch_size/process_count samples; the returned arrays
    are globally-shaped jax.Arrays addressable by the sharded train step.
    """
    def convert(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return {k: convert(np.asarray(v)) for k, v in batch.items()}


def host_tree_to_global(tree, shardings):
    """Host-value pytree (identical on every process) -> global jax.Arrays
    with the given per-leaf shardings. Used to place a restored/initialized
    train state onto a multi-process mesh (each process serves the
    addressable slices of its own devices)."""

    def convert(x, sharding):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx, _a=arr: _a[idx]
        )

    return jax.tree.map(convert, tree, shardings)
