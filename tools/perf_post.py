"""Sub-stage breakdown of the detection postprocess at batch 32:
decode/gate -> per-class top-k -> box gather -> NMS. Guides postprocess
optimization (NOTES 'postprocess gather' headroom)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ron_tensorflow_tpu.inference import DetectionConfig, Detector
from ron_tensorflow_tpu.models.ron import RON, RON_320_SPEC
from ron_tensorflow_tpu.ops import boxes as boxops
from ron_tensorflow_tpu.ops import nms as nmsops
from ron_tensorflow_tpu.ops.decode import decode_boxes


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


def main():
    spec = RON_320_SPEC
    model = RON(spec=spec, dtype=jnp.bfloat16)
    cfg = DetectionConfig()
    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(rng, jnp.zeros((1, *spec.img_shape, 3)), train=False)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    batch = 32
    img = jax.device_put(jax.random.normal(rng, (batch, *spec.img_shape, 3), jnp.float32), dev)
    out = jax.block_until_ready(jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, img))
    anchors = jnp.asarray(spec.anchor_layout().cyxhw)

    @jax.jit
    def stage_scores(out):
        decoded = decode_boxes(out.locations, anchors, spec.prior_scaling)
        decoded = boxops.clip_to_ref(decoded)
        gate = out.objness_pred > cfg.objectness_threshold
        size_ok = boxops.min_size_mask(decoded, cfg.min_size)
        scores = jnp.moveaxis(out.predictions[..., 1:], -1, -2)
        keep = (gate & size_ok)[:, None, :] & (scores > cfg.select_threshold)
        return jnp.where(keep, scores, 0.0), decoded

    scores, decoded = jax.block_until_ready(stage_scores(out))

    @jax.jit
    def stage_topk(scores):
        return jax.lax.approx_max_k(scores, cfg.top_k)

    top_scores, top_idx = jax.block_until_ready(stage_topk(scores))

    @jax.jit
    def stage_gather(decoded, top_idx):
        return jnp.take_along_axis(decoded[:, None, :, :], top_idx[..., None], axis=2)

    top_boxes = jax.block_until_ready(stage_gather(decoded, top_idx))

    @jax.jit
    def stage_nms(top_scores, top_boxes):
        f = lambda s, b: nmsops.nms_sorted_fixpoint(s, b, cfg.nms_threshold, cfg.keep_top_k, cfg.nms_mode)
        return jax.vmap(jax.vmap(f))(top_scores, top_boxes)

    print(f"scores+decode : {timeit(stage_scores, out)*1e3:7.2f} ms")
    print(f"approx_top_k  : {timeit(stage_topk, scores)*1e3:7.2f} ms")
    print(f"box gather    : {timeit(stage_gather, decoded, top_idx)*1e3:7.2f} ms")
    print(f"fixpoint NMS  : {timeit(stage_nms, top_scores, top_boxes)*1e3:7.2f} ms")

    det = Detector(model, spec, cfg)
    print(f"full postproc : {timeit(jax.jit(det.postprocess), out)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
