"""Microbench: exact selection top-k variants on the detection shapes.

The round-5 crowded A/B (NOTES.md) made EXACT per-class selection the
library default (approx_max_k measured -0.002 mAP on dense scenes), which
put lax.top_k over [B, C-1, N=21250] back on the hot path. This measures
plain lax.top_k vs exact_top_k_chunked (bit-identical, ops/math.py) vs
approx_max_k (the rejected knob, for scale) standalone and inside the full
Detector postprocess, so the default `topk_chunks` choice is evidence-based.

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_topk.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(out):
    # one element, sliced on device — fetching a whole output array would
    # drag MBs through the tunnel and dominate sub-ms timings
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, iters=30, warmup=3):
    out = fn()
    _barrier(out)
    for _ in range(warmup):
        out = fn()
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from ron_tensorflow_tpu.ops.math import exact_top_k_chunked

    key = jax.random.PRNGKey(0)
    n, c, k = 21250, 20, 200
    x = jax.random.uniform(key, (bs, c, n), jnp.float32)
    # realistic sparsity: most scores masked to exactly 0 by the gate
    x = jnp.where(x > 0.03, 0.0, x)

    print(f"standalone [B={bs}, C-1={c}, N={n}] k={k}:")
    plain = jax.jit(lambda q: jax.lax.top_k(q, k))
    t = timeit(lambda: plain(x), iters=30)
    print(f"  lax.top_k            {t * 1e3:7.2f} ms")
    for nc in (4, 8, 16, 32):
        f = jax.jit(lambda q, nc=nc: exact_top_k_chunked(q, k, nc))
        t = timeit(lambda: f(x), iters=30)
        print(f"  chunked({nc:2d})          {t * 1e3:7.2f} ms")
    approx = jax.jit(lambda q: jax.lax.approx_max_k(q, k))
    t = timeit(lambda: approx(x), iters=30)
    print(f"  approx_max_k         {t * 1e3:7.2f} ms")

    # e2e: full Detector postprocess under each config
    from ron_tensorflow_tpu.inference import DetectionConfig, Detector
    from ron_tensorflow_tpu.models.ron import RON, RON_320_SPEC

    spec = RON_320_SPEC
    model = RON(spec=spec, backbone_variant="reduced", dtype=jnp.bfloat16)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(key, jnp.zeros((1, *spec.img_shape, 3), jnp.float32), train=False)
    if jax.devices()[0].platform != "cpu":
        model = model.clone(fuse_block1=True)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    image = jax.device_put(
        jax.random.normal(key, (bs, *spec.img_shape, 3), jnp.float32), device
    )
    print(f"e2e Detector (fwd+postproc), batch {bs}:")
    for name, cfg in [
        ("exact (default)", DetectionConfig()),
        ("exact chunked 8", DetectionConfig(topk_chunks=8)),
        ("exact chunked 16", DetectionConfig(topk_chunks=16)),
        ("approx (old default)", DetectionConfig(approx_top_k=True)),
        ("approx+shared (r1-r4 bench)", DetectionConfig(approx_top_k=True, shared_top_k=1000)),
    ]:
        det = Detector(model, spec, cfg)
        t = timeit(lambda: det(variables, image), iters=20)
        print(f"  {name:28s} {t * 1e3:7.2f} ms  -> {bs / t:6.1f} img/s")


if __name__ == "__main__":
    main()
