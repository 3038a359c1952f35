"""Worker for the multi-process TENSOR-PARALLEL checkpoint test: runs the
production `Trainer` on a (2, 2) dp x tp mesh across 2 jax.distributed
processes (2 CPU devices each), saving mid-run through the orbax
global-array path, then verifies that a genuinely NON-addressable sharded
tree (model axis spanning processes) checkpoints and restores exactly.

The reference's analogue is shared-filesystem checkpoint recovery of the
between-graph PS rig (ref: ron_net_multi_gpu_replica.py:408-427); it never
had model-parallel state, so the non-addressable case is new surface.

Usage: multiprocess_tp_worker.py <port> <pid> <nproc> <max_steps>
           <save_every> <data_dir> <model_dir> <nonaddr_dir>
Prints one JSON line: {pid, step, nonaddr_ok}.
"""

import json
import sys


def main():
    (port, pid, nproc, max_steps, save_every, data_dir, model_dir,
     nonaddr_dir) = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
        int(sys.argv[5]),
        sys.argv[6],
        sys.argv[7],
        sys.argv[8],
    )

    from ron_tensorflow_tpu.parallel import initialize_distributed, process_info

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert process_info() == (pid, nproc)

    import jax
    import numpy as np
    from dataclasses import replace

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.train.trainer import Trainer

    cfg = apply_overrides(
        TrainConfig(),
        [
            "model=ron_tiny_vgg",
            f"model_dir={model_dir}",
            f"data.dataset_dir={data_dir}",
            "data.file_pattern=mp_train_*.tfrecord",
            "data.batch_size=2",  # LOCAL batch; global = 2 * nproc
            "data.max_boxes=4",
            "data.shuffle=false",
            "data.use_grain=true",  # input-position restore => exact resume
            f"data.num_workers={nproc}",
            f"data.worker_index={pid}",
            "mesh_shape=[2,2]",  # dp x tp over the 4 global devices
            f"max_steps={max_steps}",
            "log_every_steps=1",
            f"save_every_steps={save_every}",
            "bfloat16=false",
            "optimizer.learning_rate=0.01",
            "optimizer.learning_rate_decay_type=fixed",
        ],
    )
    cfg = replace(cfg, data=replace(cfg.data, working_shape=(64, 64)))
    trainer = Trainer(cfg)
    state = trainer.train()

    # ---- non-addressable global-array checkpoint round-trip ---- #
    # Transposed mesh: 'model' axis spans the two processes, so each param
    # shard lives on exactly one process and jax.device_get of the full
    # array is impossible — the layout trainer.py's orbax save must handle.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ron_tensorflow_tpu.train.checkpoint import CheckpointManager

    devs = np.asarray(jax.devices()).reshape(2, 2).T  # model across processes
    mesh = Mesh(devs, ("data", "model"))
    host = {
        "w": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "b": np.arange(4, dtype=np.float32) * 0.5,
    }
    sharded = {
        k: jax.make_array_from_callback(
            v.shape,
            NamedSharding(mesh, P("model", *([None] * (v.ndim - 1)))),
            lambda idx, _a=v: _a[idx],
        )
        for k, v in host.items()
    }
    assert not sharded["w"].is_fully_addressable, "expected cross-process shards"
    mgr = CheckpointManager(nonaddr_dir)
    mgr.save(1, sharded)
    mgr.wait()
    like = {k: np.zeros_like(v) for k, v in host.items()}
    restored = mgr.restore(like, step=1)
    nonaddr_ok = all(
        np.array_equal(np.asarray(restored[k]), host[k]) for k in host
    )

    print(json.dumps({"pid": pid, "step": int(state.step),
                      "nonaddr_ok": bool(nonaddr_ok)}))


if __name__ == "__main__":
    main()
