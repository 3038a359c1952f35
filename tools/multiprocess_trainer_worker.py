"""Worker for the multi-process TRAINER test: runs the REAL production
`Trainer` (host pipeline with per-process file sharding -> global batch
assembly -> sharded fused step -> orbax checkpointing) inside a
jax.distributed cluster — the full equivalent of the reference's
between-graph Supervisor rig (ref: ron_net_multi_gpu_replica.py:319-448),
not just a bare train step.

Usage: multiprocess_trainer_worker.py <port> <pid> <nproc> <steps> \
           <data_dir> <model_dir>
Prints one JSON line: {pid, step, losses, param_fingerprint}.
"""

import json
import sys


def main():
    port, pid, nproc, steps, data_dir, model_dir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
        sys.argv[5],
        sys.argv[6],
    )

    from ron_tensorflow_tpu.parallel import initialize_distributed, process_info

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert process_info() == (pid, nproc)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.train.trainer import Trainer
    from dataclasses import replace

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
            f"data.num_workers={nproc}",
            f"data.worker_index={pid}",
            f"max_steps={steps}",
            "log_every_steps=1",
            f"save_every_steps={steps}",
            "bfloat16=false",
            "optimizer.learning_rate=0.01",
            "optimizer.learning_rate_decay_type=fixed",
        ],
    )
    cfg = replace(cfg, data=replace(cfg.data, working_shape=(64, 64)))
    trainer = Trainer(cfg)
    state = trainer.train()
    fingerprint = float(
        sum(
            float(np.abs(np.asarray(p, np.float64)).sum())
            for p in jax.tree.leaves(jax.device_get(state.params))
        )
    )
    print(
        json.dumps(
            {
                "pid": pid,
                "global_devices": len(jax.devices()),
                "step": int(state.step),
                "param_fingerprint": fingerprint,
            }
        )
    )


if __name__ == "__main__":
    main()
