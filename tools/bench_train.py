"""Training-step throughput on one chip: full fused step (device
augmentation + GT encode + fwd/bwd + update) on synthetic host batches —
isolates device step time from the input pipeline.

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_train.py [batch ...]
Env: BENCH_TRAIN_FLAGS — extra dotted TrainConfig overrides, comma-separated
     (e.g. BENCH_TRAIN_FLAGS="bn_fast_normalize=true,fuse_block1=true").
     BENCH_TRAIN_MODEL — model name (default ron_320_vgg); the image size
     follows the model spec.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
from ron_tensorflow_tpu.train.trainer import Trainer


def main():
    batches = [int(a) for a in sys.argv[1:]] or [14, 32]
    model_name = os.environ.get("BENCH_TRAIN_MODEL", "ron_320_vgg")
    for bs in batches:
        cfg = apply_overrides(
            TrainConfig(),
            [
                f"model={model_name}",
                "model_dir=/tmp/bench_train_model",
                f"data.batch_size={bs}",
                "data.max_boxes=8",
                "bfloat16=true",
                "mesh_shape=[1, 1]",
                "optimizer.learning_rate_decay_type=fixed",
                *[f for f in os.environ.get("BENCH_TRAIN_FLAGS", "").split(",") if f],
            ],
        )
        t = Trainer(cfg)
        from ron_tensorflow_tpu.parallel import make_mesh, partition_batch, partition_params
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh((1, 1))
        state = t.init_state()
        shardings = state.replace(
            step=NamedSharding(mesh, P()),
            params=partition_params(state.params, mesh),
            batch_stats=jax.tree.map(lambda _: NamedSharding(mesh, P()), state.batch_stats),
            opt_state=jax.tree.map(lambda _: NamedSharding(mesh, P()), state.opt_state),
            ema_params=None,
        )
        state = jax.device_put(state, shardings)
        step_fn = jax.jit(
            t._full_step, in_shardings=(shardings, None, None), donate_argnums=(0,)
        )

        rng = np.random.default_rng(0)
        batch = {
            "image01": jnp.asarray(
                rng.integers(0, 255, (bs, 512, 512, 3), np.uint8)
            ),
            "gt_boxes": jnp.asarray(
                np.tile(np.array([[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 7], np.float32), (bs, 1, 1))
            ),
            "gt_labels": jnp.asarray(np.tile(np.array([[3] + [0] * 7], np.int32), (bs, 1))),
            "gt_valid": jnp.asarray(np.tile(np.array([[True] + [False] * 7]), (bs, 1))),
        }
        key = jax.random.PRNGKey(0)

        state, metrics = step_fn(state, batch, key)
        np.asarray(metrics["loss/total"])  # fetch barrier through the tunnel
        for _ in range(3):
            state, metrics = step_fn(state, batch, key)
        np.asarray(metrics["loss/total"])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch, key)
        np.asarray(metrics["loss/total"])
        dt = (time.perf_counter() - t0) / iters
        print(
            f"batch {bs:3d}: {dt * 1e3:7.2f} ms/step  ->  {bs / dt:7.1f} img/s/chip"
        )


if __name__ == "__main__":
    main()
