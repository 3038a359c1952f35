"""Benchmark: RON-320 end-to-end inference throughput on one TPU chip.

Measures the full detection pipeline (forward + decode + objectness gate +
per-class select/clip/filter/sort/NMS — the `eval_ron_network` path) in
bfloat16, batch 32, and prints ONE JSON line.

Baseline note: the reference (TF1, GPU) publishes no throughput numbers —
only "sec/image" printed at runtime (ref: ron_eval.py:582-584,
eval_ron_network.py:362-366; BASELINE.md "Eval latency: no published
value"). BASELINE.json's target is >=5x images/sec/chip over the TF1
reference; we take 25 img/s as the assumed reference single-GPU rate for a
VGG-16 RON-320 eval loop (typical for TF1-era SSD/RON eval pipelines with
CPU NMS), so vs_baseline = value / 25.0 and the 5x target corresponds to
vs_baseline >= 5.
"""

import json
import time

import jax
import jax.numpy as jnp

ASSUMED_REFERENCE_IMG_PER_SEC = 25.0
BATCH = 32
WARMUP = 3
ITERS = 20


def main():
    from ron_tensorflow_tpu.inference import DetectionConfig, Detector
    from ron_tensorflow_tpu.models.ron import RON, RON_320_SPEC

    model = RON(spec=RON_320_SPEC, backbone_variant="reduced", dtype=jnp.bfloat16)
    spec = RON_320_SPEC

    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((BATCH, *spec.img_shape, 3), jnp.float32)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(rng, image[:1], train=False)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    image = jax.device_put(
        jax.random.normal(rng, (BATCH, *spec.img_shape, 3), jnp.float32), device
    )

    detector = Detector(model, spec, DetectionConfig())

    import numpy as np

    # Compile + warmup. NOTE: the timing barrier is a small device->host
    # fetch, not block_until_ready — through the axon relay the latter can
    # ack before compute completes, inflating throughput by orders of
    # magnitude. A fetch of the last output cannot complete early because
    # the device executes the queue in order.
    out = detector(variables, image)
    np.asarray(out[0][0, 0])
    for _ in range(WARMUP):
        out = detector(variables, image)
    np.asarray(out[0][0, 0])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = detector(variables, image)
    np.asarray(out[0][0, 0])
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "ron320_inference_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / ASSUMED_REFERENCE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
