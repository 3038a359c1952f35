"""Benchmark: RON-320 end-to-end inference throughput on one TPU chip.

Measures the full detection pipeline (forward + decode + objectness gate +
per-class select/clip/filter/sort/NMS — the `eval_ron_network` path) in
bfloat16, batch 32, and prints ONE JSON line.

Baseline: MEASURED, not assumed. tools/reference_forward.py runs the
reference's OWN ron_net_reducedfc graph (nets/ron_vgg_320.py:510-580, via
tools/slim_shim.py on tf.compat.v1) on this machine's host CPU and records
images/sec in BASELINE_MEASURED.json; vs_baseline here is
measured(TPU, ours) / measured(CPU, reference-code) on the same host.
The reference published no throughput numbers (ref: ron_eval.py:582-584,
eval_ron_network.py:362-366 print timings only), and no GPU exists in this
environment, so same-host CPU is the only measurable reference condition;
the measurement conditions are recorded alongside the number. Fallback when
BASELINE_MEASURED.json is absent: 25 img/s (the round-1 assumption).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

ASSUMED_REFERENCE_IMG_PER_SEC = 25.0


def reference_baseline():
    """(img_per_sec, source) — measured if available."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            measured = json.load(f)
        return (
            float(measured["reference_forward_images_per_sec"]),
            "measured: reference ron_net_reducedfc graph, 1-core host CPU (see BASELINE_MEASURED.json)",
        )
    except (OSError, KeyError, ValueError):
        return ASSUMED_REFERENCE_IMG_PER_SEC, "assumed (BASELINE_MEASURED.json missing)"
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
    # fuse_block1: the Pallas whole-block-1 kernel (conv1_1+conv1_2+pool in
    # VMEM) — same param tree, TPU-only; with the pallas NMS + shared
    # preselection defaults this is the fastest verified-exact configuration
    # (see NOTES.md round-2 findings). Init above stays on the CPU backend,
    # where the fused path must not trace.
    if jax.devices()[0].platform != "cpu":
        model = model.clone(fuse_block1=True)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    image = jax.device_put(
        jax.random.normal(rng, (BATCH, *spec.img_shape, 3), jnp.float32), device
    )

    # shared_top_k=1000: the A/B-validated whole-image preselection (library
    # default is 0 = strict reference semantics; see DetectionConfig).
    detector = Detector(model, spec, DetectionConfig(shared_top_k=1000))

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
    base, base_src = reference_baseline()
    print(
        json.dumps(
            {
                "metric": "ron320_inference_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / base, 2),
                "baseline_img_per_sec": base,
                "baseline_source": base_src,
            }
        )
    )


if __name__ == "__main__":
    main()
