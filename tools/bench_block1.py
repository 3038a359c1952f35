"""Microbenchmark: VGG block 1 (conv1_1 + conv1_2 + pool) — XLA composition
vs the fused Pallas kernel — plus the end-to-end detector with/without
fuse_block1. Decides VERDICT item 7 (Pallas: win or cut).

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_block1.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ron_tensorflow_tpu.kernels import fused_vgg_block1


def fetch_barrier(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    fetch_barrier(out)
    for _ in range(warmup):
        out = fn(*args)
    fetch_barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_barrier(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def xla_block1(x, w1, b1, w2, b2):
    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return jax.nn.relu(y + b.astype(jnp.bfloat16))

    y = conv(conv(x, w1, b1), w2, b2)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ).astype(x.dtype)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    for batch, h, w in ((32, 320, 320), (32, 300, 300)):
        x = jax.device_put(
            jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.bfloat16), dev
        )
        w1 = jax.device_put(jnp.asarray(rng.normal(size=(3, 3, 3, 64)) * 0.1, jnp.float32), dev)
        b1 = jax.device_put(jnp.asarray(rng.normal(size=(64,)), jnp.float32), dev)
        w2 = jax.device_put(jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32), dev)
        b2 = jax.device_put(jnp.asarray(rng.normal(size=(64,)), jnp.float32), dev)

        t_xla = timeit(xla_block1, x, w1, b1, w2, b2)
        t_fused = timeit(fused_vgg_block1, x, w1, b1, w2, b2)
        # numerics check on device
        a = np.asarray(xla_block1(x, w1, b1, w2, b2), np.float32)
        b = np.asarray(fused_vgg_block1(x, w1, b1, w2, b2), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(
            f"[{batch}x{h}x{w}] xla {t_xla*1e3:7.2f} ms   fused {t_fused*1e3:7.2f} ms   "
            f"speedup {t_xla/t_fused:5.2f}x   rel_err {err:.2e}"
        )


if __name__ == "__main__":
    main()
