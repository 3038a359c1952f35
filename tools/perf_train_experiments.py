"""A/B harness for train-step throughput experiments (VERDICT r2 weak #1).

Runs the FULL fused train step (aug + encode + fwd/bwd + update, donated
state — exactly what the Trainer jits) under several step variants and
prints img/s for each. Variants that need process-level XLA flags are run
via env:  XLA_FLAGS="..." python tools/perf_train_experiments.py

Variants:
  base        the production step (make_train_step, donated)
  remat       full-model rematerialization of the fwd inside the backward
              (jax.checkpoint on the loss closure, nothing saved) — trades
              recompute FLOPs for HBM activation traffic
  remat_dots  jax.checkpoint with the dots_saveable policy (matmul outputs
              kept; conv intermediates recomputed)
  bn_fast     train-time BN normalize fused in bf16 (f32 statistics kept) —
              see models/layers.py set_bn_fast_normalize
  block1      fused Pallas block 1 in the train step (custom recompute VJP:
              Pallas fwd, XLA-recomputed bwd — block-1 activations never
              stored; see kernels/fused_conv_pool.py)
  block1_bn   block1 + bn_fast combined
  remat12     nn.remat on blocks 1-2 only (VGG16Backbone.remat_blocks12) —
              recompute the bandwidth-bound early activations in the bwd
              instead of round-tripping them through HBM

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_train_experiments.py [bs] [variant...]
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


def make_remat_step(model, encoder, tx, loss_config, policy=None):
    """make_train_step variant with jax.checkpoint around forward+loss."""
    import optax

    from ron_tensorflow_tpu.train.state import TrainState, detection_loss_fn

    loss = detection_loss_fn(loss_config)

    def train_step(state, batch, rng):
        targets = encoder.batched(
            batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"]
        )
        rng_loss, rng_dropout = jax.random.split(rng)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_dropout},
            )
            total, metrics = loss(rng_loss, out, targets)
            return total, (metrics, mutated["batch_stats"])

        loss_fn = jax.checkpoint(loss_fn, policy=policy)
        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema_params=state.ema_params,
            ),
            metrics,
        )

    return train_step


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    wanted = sys.argv[2:] or ["base", "bn_fast", "remat", "remat_dots", "block1",
                              "block1_bn", "remat12"]

    from ron_tensorflow_tpu.data.preprocess import PreprocessConfig, train_augment_batch
    from ron_tensorflow_tpu.losses.ron import RonLossConfig
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.ops.encode import TargetEncoder
    from ron_tensorflow_tpu.train.optimizer import OptimizerConfig, make_optimizer
    from ron_tensorflow_tpu.train.state import create_train_state, make_train_step

    model, spec = get_network("ron_320_vgg")
    model = model.clone(dtype=jnp.bfloat16)
    encoder = TargetEncoder(spec.anchor_layout(), spec.img_shape, 0.56, 0.3,
                            spec.prior_scaling)
    tx = make_optimizer(OptimizerConfig(learning_rate_decay_type="fixed"))
    pc = PreprocessConfig(out_shape=spec.img_shape)

    rng = np.random.default_rng(0)
    raw = {
        "image01": jnp.asarray(rng.integers(0, 255, (bs, 512, 512, 3), np.uint8)),
        "gt_boxes": jnp.tile(jnp.asarray(
            np.array([[[0.2, 0.2, 0.7, 0.7]] + [[0.0] * 4] * 7], np.float32)),
            (bs, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray(np.array([[3] + [0] * 7], np.int32)),
                              (bs, 1)),
        "gt_valid": jnp.tile(jnp.asarray(np.array([[True] + [False] * 7])),
                             (bs, 1)),
    }
    raw = jax.device_put(raw)
    key = jax.random.PRNGKey(0)

    def full(step_fn):
        def f(state, host_batch, rng):
            k_aug, k_loss = jax.random.split(rng)
            image01 = host_batch["image01"].astype(jnp.float32) / 255.0
            image, boxes, labels, valid = train_augment_batch(
                k_aug, image01, host_batch["gt_boxes"], host_batch["gt_labels"],
                host_batch["gt_valid"], pc)
            return step_fn(state, {"image": image, "gt_labels": labels,
                                   "gt_boxes": boxes, "gt_valid": valid}, k_loss)
        return f

    variants = {}
    if "base" in wanted:
        variants["base"] = make_train_step(model, encoder, tx, RonLossConfig())
    if "bn_fast" in wanted:
        # flag is read at trace time — toggled around the jit warmup below
        variants["bn_fast"] = make_train_step(model, encoder, tx, RonLossConfig())
    if "remat" in wanted:
        variants["remat"] = make_remat_step(
            model, encoder, tx, RonLossConfig(),
            policy=jax.checkpoint_policies.nothing_saveable)
    if "remat_dots" in wanted:
        variants["remat_dots"] = make_remat_step(
            model, encoder, tx, RonLossConfig(),
            policy=jax.checkpoint_policies.dots_saveable)
    fused_model = model.clone(fuse_block1=True)
    if "block1" in wanted:
        variants["block1"] = make_train_step(
            fused_model, encoder, tx, RonLossConfig())
    if "block1_bn" in wanted:
        variants["block1_bn"] = make_train_step(
            fused_model, encoder, tx, RonLossConfig())
    if "remat12" in wanted:
        # blocks 1-2 only (nn.remat span in VGG16Backbone): their saved
        # activations dominate block 1's measured ~3x-over-floor HBM traffic
        # (NOTES round-4 #1); full-model remat already measured 0.81x, this
        # targets just the bandwidth-bound span
        variants["remat12"] = make_train_step(
            model.clone(remat_blocks12=True), encoder, tx, RonLossConfig())

    from ron_tensorflow_tpu.models import layers

    results = {}
    for name, step in variants.items():
        layers.set_bn_fast_normalize(name in ("bn_fast", "block1_bn"))
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (bs, *spec.img_shape, 3), tx)
        state = jax.device_put(state)
        jit_step = jax.jit(full(step), donate_argnums=(0,))
        holder = [state]

        def run():
            holder[0], m = jit_step(holder[0], raw, key)
            return m

        try:
            t = timeit(run, lambda m: m["loss/total"])
            results[name] = t
            print(f"  {name:12s} {t * 1e3:7.2f} ms  -> {bs / t:6.1f} img/s")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {name:12s} FAILED: {type(e).__name__}: {e}")
        finally:
            layers.set_bn_fast_normalize(False)

    if "base" in results:
        base = results["base"]
        for name, t in results.items():
            if name != "base":
                print(f"  {name} vs base: {base / t:.3f}x")


if __name__ == "__main__":
    main()
