"""Stage-wise timing of the fused train step on one chip.

Separates the full step (aug + encode + fwd/bwd + update) into jitted
stages to locate the train-side bottleneck (VERDICT r2 weak #1: step is
~50% MXU). Each stage is timed standalone with a device->host fetch as the
barrier (see .claude/skills/verify/SKILL.md for why block_until_ready is
not trustworthy through the tunnel).

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_train_breakdown.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, fetch, iters=20, warmup=3):
    out = fn()
    np.asarray(fetch(out))
    for _ in range(warmup):
        out = fn()
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from ron_tensorflow_tpu.config import TrainConfig, apply_overrides
    from ron_tensorflow_tpu.data.preprocess import PreprocessConfig, train_augment_batch
    from ron_tensorflow_tpu.losses.ron import RonLossConfig
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.ops.encode import TargetEncoder
    from ron_tensorflow_tpu.train.optimizer import OptimizerConfig, make_optimizer
    from ron_tensorflow_tpu.train.state import (
        create_train_state,
        detection_loss_fn,
        make_train_step,
    )

    model, spec = get_network("ron_320_vgg")
    model = model.clone(dtype=jnp.bfloat16)
    encoder = TargetEncoder(spec.anchor_layout(), spec.img_shape, 0.56, 0.3,
                            spec.prior_scaling)
    tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
    pc = PreprocessConfig(out_shape=spec.img_shape)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (bs, *spec.img_shape, 3), tx)
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    raw = {
        "image01": jax.device_put(jnp.asarray(
            rng.integers(0, 255, (bs, 512, 512, 3), np.uint8))),
        "gt_boxes": jax.device_put(jnp.tile(jnp.asarray(
            np.array([[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 7], np.float32)), (bs, 1, 1))),
        "gt_labels": jax.device_put(jnp.tile(jnp.asarray(
            np.array([[3] + [0] * 7], np.int32)), (bs, 1))),
        "gt_valid": jax.device_put(jnp.tile(jnp.asarray(
            np.array([[True] + [False] * 7])), (bs, 1))),
    }
    key = jax.random.PRNGKey(0)

    @jax.jit
    def stage_aug(b, k):
        img = b["image01"].astype(jnp.float32) / 255.0
        return train_augment_batch(k, img, b["gt_boxes"], b["gt_labels"],
                                   b["gt_valid"], pc)

    @jax.jit
    def stage_aug_encode(b, k):
        image, boxes, labels, valid = stage_aug(b, k)
        t = encoder.batched(labels, boxes, valid)
        return image, t

    loss_fn = detection_loss_fn(RonLossConfig())

    @jax.jit
    def stage_fwd_loss(params, batch_stats, image, t, k):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          image, train=False)
        total, _ = loss_fn(k, out, t)
        return total

    @jax.jit
    def stage_grad(params, batch_stats, image, t, k):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, image, train=True,
                mutable=["batch_stats"], rngs={"dropout": k},
            )
            return loss_fn(k, out, t)[0]

        return jax.grad(f)(params)

    image, t = stage_aug_encode(raw, key)
    image = jax.device_put(image)

    full = jax.jit(make_train_step(model, encoder, tx, RonLossConfig()),
                   donate_argnums=())

    ms = lambda s: f"{s * 1e3:7.2f} ms"
    t_aug = timeit(lambda: stage_aug(raw, key), lambda o: o[0][0, 0, 0])
    t_enc = timeit(lambda: stage_aug_encode(raw, key), lambda o: o[1].labels[0, 0])
    t_fwd = timeit(lambda: stage_fwd_loss(state.params, state.batch_stats, image, t, key),
                   lambda o: o)
    t_grad = timeit(lambda: stage_grad(state.params, state.batch_stats, image, t, key),
                    lambda o: jax.tree.leaves(o)[0][0])
    batch = {"image": image, "gt_labels": raw["gt_labels"],
             "gt_boxes": raw["gt_boxes"], "gt_valid": raw["gt_valid"]}
    t_full = timeit(lambda: full(state, batch, key),
                    lambda o: o[1]["loss/total"])

    print(f"batch {bs}")
    print(f"  augment          {ms(t_aug)}")
    print(f"  augment+encode   {ms(t_enc)}   (encode ~ {ms(t_enc - t_aug)})")
    print(f"  fwd+loss         {ms(t_fwd)}")
    print(f"  grad (fwd+bwd)   {ms(t_grad)}")
    print(f"  full train step  {ms(t_full)}  ->  {bs / t_full:.1f} img/s")


if __name__ == "__main__":
    main()
