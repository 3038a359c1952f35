"""Device-mesh parallelism.

One code path replaces all three of the reference's distribution flavors —
in-graph multi-tower DP (ref: ron_net_multi_gpu.py:194-219,298-376),
replicated-Estimator DP (ref: replicate_model_fn.py:52-446) and the
between-graph gRPC parameter-server architecture
(ref: ron_net_multi_gpu_replica.py:319-448): shard the SAME jitted train
step over a `jax.sharding.Mesh`. Gradient all-reduce becomes an XLA
collective over ICI (no PS, no tower averaging, no done-queue protocol);
multi-host runs reuse the identical program with per-process data sharding
(replacing the sorted-glob file slicing of
datasets/pascalvoc_common.py:76-88).
"""

from .mesh import (
    make_mesh,
    partition_batch,
    partition_batch_stats,
    partition_opt_state,
    partition_params,
    partition_rules,
)
from .multihost import (
    host_local_to_global,
    host_tree_to_global,
    initialize_distributed,
    process_info,
)

__all__ = [
    "make_mesh",
    "partition_batch",
    "partition_batch_stats",
    "partition_opt_state",
    "partition_params",
    "partition_rules",
    "host_local_to_global",
    "host_tree_to_global",
    "initialize_distributed",
    "process_info",
]
