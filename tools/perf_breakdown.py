"""Measure where RON-320 inference time goes on the TPU: forward vs decode
vs NMS postprocessing, at several batch sizes. Drives the optimization
priorities (SURVEY §7.2 step 7)."""

import time

import jax
import jax.numpy as jnp

from ron_tensorflow_tpu.inference import DetectionConfig, Detector
from ron_tensorflow_tpu.models.ron import RON, RON_320_SPEC


def _fetch_barrier(out):
    """True timing barrier: a device->host fetch of one element. Through the
    axon relay, block_until_ready can ack before compute completes."""
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    _fetch_barrier(out)
    for _ in range(warmup):
        out = fn(*args)
    _fetch_barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch_barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    spec = RON_320_SPEC
    model = RON(spec=spec, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(rng, jnp.zeros((1, *spec.img_shape, 3)), train=False)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    if dev.platform != "cpu":
        model = model.clone(fuse_block1=True)  # the production inference path
    detector = Detector(model, spec, DetectionConfig())

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    post = jax.jit(lambda out: detector.postprocess(out))

    for batch in (1, 8, 32, 64):
        img = jax.device_put(
            jax.random.normal(rng, (batch, *spec.img_shape, 3), jnp.float32), dev
        )
        t_fwd = timeit(fwd, variables, img)
        out = jax.block_until_ready(fwd(variables, img))
        t_post = timeit(post, out)
        t_full = timeit(lambda v, x: detector(v, x), variables, img)
        print(
            f"batch {batch:3d}: fwd {t_fwd * 1e3:7.2f} ms  post {t_post * 1e3:7.2f} ms  "
            f"full {t_full * 1e3:7.2f} ms  -> {batch / t_full:7.1f} img/s "
            f"(fwd-only {batch / t_fwd:7.1f} img/s)"
        )


if __name__ == "__main__":
    main()
