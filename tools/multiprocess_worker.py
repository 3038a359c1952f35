"""Worker process for the TRUE multi-process data-parallel test.

Spawned by tests/test_multiprocess.py: N local processes join a
jax.distributed cluster over the CPU backend (localhost coordinator), build
one global (data, model) mesh, assemble per-process host batches into global
arrays, and run the SAME sharded train step — the TPU-native equivalent of
the reference's localhost between-graph sync-SGD rig
(ref: ron_net_multi_gpu_replica.py:186-189 default localhost ports,
:319-448 SyncReplicasOptimizer + Supervisor loop). No parameter servers:
XLA's gradient all-reduce replaces the PS accumulators, and every process
ends each step with identical replicated parameters — which this worker
fingerprints so the test can assert cross-process agreement.

Usage: multiprocess_worker.py <port> <process_id> <num_processes> <steps>
Prints one JSON line with the per-step losses and a parameter fingerprint.
"""

import json
import sys


def main():
    port, pid, nproc, steps = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )

    import jax

    from ron_tensorflow_tpu.parallel.multihost import (
        host_local_to_global,
        initialize_distributed,
        process_info,
    )

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert process_info() == (pid, nproc)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ron_tensorflow_tpu.losses import RonLossConfig
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC
    from ron_tensorflow_tpu.ops.encode import TargetEncoder
    from ron_tensorflow_tpu.parallel import make_mesh
    from ron_tensorflow_tpu.train import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    devices = jax.devices()
    assert len(devices) >= nproc, f"want >= {nproc} global devices, have {len(devices)}"
    mesh = make_mesh((len(devices), 1), devices=devices)  # pure DP
    replicated = NamedSharding(mesh, P())

    spec = RON_TINY_SPEC
    model = RON(spec=spec)
    encoder = TargetEncoder(spec.anchor_layout(), spec.img_shape, 0.56, 0.3)
    tx = make_optimizer(OptimizerConfig(learning_rate=0.05, learning_rate_decay_type="fixed"))

    local_bs = 2
    global_bs = local_bs * nproc

    # Identical rng on every process; jit-create directly into the global
    # replicated shardings (no host->non-addressable-device transfers).
    def init_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), (global_bs, *spec.img_shape, 3), tx
        )

    state_shardings = jax.tree.map(lambda _: replicated, jax.eval_shape(init_state))
    state = jax.jit(init_state, out_shardings=state_shardings)()
    rng = jax.jit(lambda: jax.random.PRNGKey(7), out_shardings=replicated)()

    def local_batch(step_idx: int):
        # Deterministic but DIFFERENT per process — real data parallelism.
        r = np.random.default_rng(1000 * step_idx + pid)
        return {
            "image": r.normal(0, 1, (local_bs, *spec.img_shape, 3)).astype(np.float32),
            "gt_labels": r.integers(1, spec.num_classes, (local_bs, 2)).astype(np.int32),
            "gt_boxes": np.tile(
                np.array([[[0.1, 0.1, 0.6, 0.6], [0.4, 0.4, 0.9, 0.9]]], np.float32),
                (local_bs, 1, 1),
            ),
            "gt_valid": np.ones((local_bs, 2), bool),
        }

    batch_shardings = {
        k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        for k, v in local_batch(0).items()
    }
    step_fn = jax.jit(
        make_train_step(model, encoder, tx, RonLossConfig()),
        in_shardings=(state_shardings, batch_shardings, replicated),
    )

    losses = []
    for i in range(steps):
        gbatch = host_local_to_global(local_batch(i), mesh)
        state, metrics = step_fn(state, gbatch, rng)
        losses.append(float(metrics["loss/total"]))

    fingerprint = float(
        jax.jit(
            lambda s: jax.tree.reduce(
                jnp.add, jax.tree.map(lambda p: jnp.sum(jnp.abs(p.astype(jnp.float64))), s.params)
            ),
            out_shardings=replicated,
        )(state)
    )
    print(
        json.dumps(
            {
                "pid": pid,
                "global_devices": len(devices),
                "losses": losses,
                "param_fingerprint": fingerprint,
                "step": int(state.step),
            }
        )
    )


if __name__ == "__main__":
    main()
