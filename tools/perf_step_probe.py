"""Cumulative in-situ decomposition of the full train step.

perf_train_breakdown.py times stages as STANDALONE jitted programs, which
mis-attributes scheduling/fusion effects of the fused step. This probe
instead builds CUMULATIVE variants of the production step (each adds one
stage) and reports successive deltas — the in-situ cost of every stage,
including the ones breakdown can't see (optimizer update, BN-stats write,
metrics, state re-materialization).

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_step_probe.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


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

    from ron_tensorflow_tpu.data.preprocess import (
        PreprocessConfig,
        train_augment_batch,
    )
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
    encoder = TargetEncoder(
        spec.anchor_layout(), spec.img_shape, 0.56, 0.3, spec.prior_scaling
    )
    tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
    pc = PreprocessConfig(out_shape=spec.img_shape)
    loss_fn = detection_loss_fn(RonLossConfig())

    state = create_train_state(
        model, jax.random.PRNGKey(0), (bs, *spec.img_shape, 3), tx
    )
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    raw = {
        "image01": jax.device_put(
            jnp.asarray(rng.integers(0, 255, (bs, 512, 512, 3), np.uint8))
        ),
        "gt_boxes": jax.device_put(
            jnp.tile(
                jnp.asarray(
                    np.array([[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 7], np.float32)
                ),
                (bs, 1, 1),
            )
        ),
        "gt_labels": jax.device_put(
            jnp.tile(jnp.asarray(np.array([[3] + [0] * 7], np.int32)), (bs, 1))
        ),
        "gt_valid": jax.device_put(
            jnp.tile(jnp.asarray(np.array([[True] + [False] * 7])), (bs, 1))
        ),
    }
    key = jax.random.PRNGKey(0)

    def aug_encode(b, k):
        img = b["image01"].astype(jnp.float32) / 255.0
        image, boxes, labels, valid = train_augment_batch(
            k, img, b["gt_boxes"], b["gt_labels"], b["gt_valid"], pc
        )
        return image, encoder.batched(labels, boxes, valid)

    def make_loss_closure(st, image, targets, k_loss, k_drop):
        def f(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": st.batch_stats},
                image,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            total, metrics = loss_fn(k_loss, out, targets)
            return total, (metrics, mutated["batch_stats"])

        return f

    # --- cumulative variants -------------------------------------------
    @jax.jit
    def v_aug(st, b, k):
        image, t = aug_encode(b, k)
        return image[0, 0, 0, 0] + t.labels[0, 0]

    # IMPORTANT: every variant must consume ALL of what it claims to compute
    # (sum over every tree leaf). Consuming a single leaf lets XLA dead-code
    # eliminate the other weight-grad contractions and most of the state
    # update — the original single-leaf probe under-reported the backward by
    # ~30 ms at batch 32 and mis-attributed it to "full step overhead".
    def _consume(tree):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))

    @jax.jit
    def v_fwd(st, b, k):
        image, t = aug_encode(b, k)
        k_loss, k_drop = jax.random.split(k)
        total, (_, new_bs) = make_loss_closure(st, image, t, k_loss, k_drop)(
            st.params
        )
        return total + _consume(new_bs)

    @jax.jit
    def v_grad(st, b, k):
        image, t = aug_encode(b, k)
        k_loss, k_drop = jax.random.split(k)
        grads, (metrics, new_bs) = jax.grad(
            make_loss_closure(st, image, t, k_loss, k_drop), has_aux=True
        )(st.params)
        return metrics["loss/total"] + _consume(grads) + _consume(new_bs)

    @jax.jit
    def v_update(st, b, k):
        image, t = aug_encode(b, k)
        k_loss, k_drop = jax.random.split(k)
        grads, (metrics, new_bs) = jax.grad(
            make_loss_closure(st, image, t, k_loss, k_drop), has_aux=True
        )(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return (
            metrics["loss/total"]
            + _consume(new_params)
            + _consume(new_opt)
            + _consume(new_bs)
        )

    # Production full step: make_train_step takes pre-augmented batches
    # (the Trainer jits aug inside _full_step), so wrap aug inline to match.
    step = make_train_step(model, encoder, tx, RonLossConfig())

    def full_with_aug(st, b, k):
        k_aug, k_loss = jax.random.split(k)
        img = b["image01"].astype(jnp.float32) / 255.0
        image, boxes, labels, valid = train_augment_batch(
            k_aug, img, b["gt_boxes"], b["gt_labels"], b["gt_valid"], pc
        )
        return step(
            st,
            {
                "image": image,
                "gt_labels": labels,
                "gt_boxes": boxes,
                "gt_valid": valid,
            },
            k_loss,
        )

    full = jax.jit(full_with_aug, donate_argnums=())

    names = ["aug+encode", "+fwd+loss", "+bwd", "+optimizer", "full step"]
    fns = [
        (lambda: v_aug(state, raw, key), lambda o: o),
        (lambda: v_fwd(state, raw, key), lambda o: o),
        (lambda: v_grad(state, raw, key), lambda o: o),
        (lambda: v_update(state, raw, key), lambda o: o),
        (lambda: full(state, raw, key), lambda o: o[1]["loss/total"]),
    ]

    print(f"batch {bs} (cumulative, non-donated)")
    prev = 0.0
    for name, (fn, fetch) in zip(names, fns):
        t = timeit(fn, fetch)
        print(
            f"  {name:12s} {t * 1e3:7.2f} ms   (delta {1e3 * (t - prev):+7.2f} ms)"
        )
        prev = t
    print(f"  -> {bs / prev:.1f} img/s (non-donated full)")


if __name__ == "__main__":
    main()
