"""p50/p90 end-to-end single-image latency — the BASELINE.md tracked metric
the throughput bench does not cover.

Measures the realtime-inference path (the reference's `ron_eval.py` serving
condition: one image in, final detections out — ref: ron_eval.py:529-584
logs "sec/image") at batch 1 on the real chip: host->device upload + fused
forward+decode+gate+NMS + device->host fetch of the final detections.
Per-iteration the barrier is a host fetch of the outputs (NOT
block_until_ready — through the axon relay that can ack early, see
tools/perf_breakdown.py), so each sample is a true pixels-to-boxes
wall-clock latency.

Run: PYTHONPATH=. python tools/bench_latency.py [model]
Env: LAT_ITERS (default 100), LAT_BATCH (default 1)
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ron_tensorflow_tpu.inference.detector import (
        Detector,
        DetectionConfig,
        RealtimeConfig,
        RealtimeDetector,
    )
    from ron_tensorflow_tpu.models import get_network

    model_name = sys.argv[1] if len(sys.argv) > 1 else "ron_320_vgg"
    iters = max(1, int(os.environ.get("LAT_ITERS", "100")))
    batch = int(os.environ.get("LAT_BATCH", "1"))

    model, spec = get_network(model_name)
    model = model.clone(dtype=jnp.bfloat16)
    # no fuse_block1: at batch 1 the Pallas block-1 per-program overhead is
    # not amortized (3.97 vs 3.19 ms forward, NOTES.md round-2) — keep the
    # serving path on XLA.

    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            rng, jnp.zeros((1, *spec.img_shape, 3), jnp.float32), train=False
        )
    device = jax.devices()[0]
    # WHITENED pixel-scale inputs (uint8 -> [0,1] -> VGG mean subtraction):
    # the serving input distribution, not standard-normal noise.
    from ron_tensorflow_tpu.data.preprocess import whiten_np

    host_rng = np.random.default_rng(0)
    images = whiten_np(
        host_rng.integers(0, 256, (iters, batch, *spec.img_shape, 3)).astype(
            np.float32
        )
        / 255.0
    )

    # The NMS while-loop iteration count depends on gate pass-rate /
    # suppression chain depth, so random weights measure a synthetic NMS
    # occupancy. Default to a trained checkpoint: LAT_CKPT, else the
    # dress-rehearsal path for this model if one exists on this host.
    import glob

    candidates = [os.environ.get("LAT_CKPT", "")] + sorted(
        glob.glob(f"/tmp/dress_{model_name}*/model")
    )
    ckpt = next((c for c in candidates if c and os.path.isdir(c)), None)
    if ckpt:
        from ron_tensorflow_tpu.train.checkpoint import CheckpointManager

        variables, step = CheckpointManager(ckpt).restore_eval(
            variables["params"], variables.get("batch_stats", {})
        )
        print(f"weights: trained {ckpt} (step {step})")
    else:
        print("note: RANDOM weights — NMS occupancy is synthetic "
              "(set LAT_CKPT=<orbax dir> for trained-distribution latency)")
    variables = jax.device_put(variables, device)
    warm_image = whiten_np(
        host_rng.integers(0, 256, (batch, *spec.img_shape, 3)).astype(np.float32)
        / 255.0
    )

    def run(name, detector, fetch):
        # compile + warmup on a dedicated image (never one of the timed set)
        for _ in range(3):
            out = detector(variables, jax.device_put(warm_image, device))
            fetch(out)
        lat = []
        for i in range(iters):
            t0 = time.perf_counter()
            out = detector(variables, jax.device_put(images[i], device))
            fetch(out)  # host fetch = true completion barrier
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.sort(np.asarray(lat))
        p50 = float(np.percentile(lat, 50))
        p90 = float(np.percentile(lat, 90))
        p99 = float(np.percentile(lat, 99))
        print(
            f"{name:28s} batch={batch}  p50 {p50:7.2f} ms  p90 {p90:7.2f} ms"
            f"  p99 {p99:7.2f} ms  ({batch * 1e3 / p50:.1f} img/s at p50)"
        )
        return p50

    rt = RealtimeDetector(model, spec, RealtimeConfig.for_spec(spec))
    run(
        "realtime (ron_eval path)",
        rt,
        lambda out: [np.asarray(o) for o in out],
    )
    det = Detector(model, spec, DetectionConfig())
    run(
        "streaming (eval_ron path)",
        det,
        lambda out: [np.asarray(o) for o in out],
    )


if __name__ == "__main__":
    main()
