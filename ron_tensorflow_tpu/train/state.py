"""Training state and the jittable train step.

TPU-native replacement for the reference's graph-assembly trainers
(ref: ron_net.py:195-418 single-GPU; the multi-GPU/PS drivers T2-T4 are
subsumed by sharding the SAME step over a mesh — see
`ron_tensorflow_tpu.parallel`). One pure `train_step` holds the entire
per-step computation: GT encoding, forward, loss, backward, optimizer
update, BN stats update, EMA — all fused by XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.ron import RonLossConfig, ron_losses
from ..ops.encode import TargetEncoder


@flax.struct.dataclass
class TrainState:
    """Model + optimizer + BN state (+ optional EMA shadow params,
    ref: eval_ssd_network.py:209-217 restores EMA variables)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(
    model, rng: jax.Array, input_shape, tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def detection_loss_fn(loss_config) -> Callable:
    """(rng, outputs, targets) -> (loss, metrics) for the config's family:
    RonLossConfig -> ron_losses; SsdLossConfig -> ssd_losses."""
    from ..losses.ssd import SsdLossConfig, ssd_losses

    if isinstance(loss_config, SsdLossConfig):
        def fn(rng, out, targets):
            del rng
            return ssd_losses(
                out.logits, out.locations, targets.labels, targets.locations,
                targets.scores, loss_config,
            )

        return fn

    def fn(rng, out, targets):
        return ron_losses(
            rng,
            out.logits,
            out.locations,
            out.objness_logits,
            out.objness_pred,
            targets.labels,
            targets.locations,
            loss_config,
        )

    return fn


def make_train_step(
    model,
    encoder: TargetEncoder,
    tx: optax.GradientTransformation,
    loss_config=RonLossConfig(),
    ema_decay: Optional[float] = None,
) -> Callable:
    """Build the pure train step.

    The returned function maps
      (state, batch, rng) -> (new_state, metrics)
    with batch = dict(image [B,H,W,3] whitened, gt_labels [B,G],
    gt_boxes [B,G,4], gt_valid [B,G]). `loss_config` selects the loss family
    (RON random-negative / SSD hard-negative mining).

    GT encoding runs on device inside the step — the reference did matching
    on CPU inside 24 preprocessing threads (ref: ron_net.py:277-306); on TPU
    the vectorized matcher is cheap and keeps the host pipeline IO-only.
    """
    loss = detection_loss_fn(loss_config)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array) -> Tuple[TrainState, Dict]:
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

        grads, (metrics, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params,
                new_params,
            )

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, encoder, loss_config=RonLossConfig()):
    """Forward + loss without updates (eval-time loss reporting,
    ref: eval_ron_network.py:212-220)."""
    loss = detection_loss_fn(loss_config)

    def eval_step(state: TrainState, batch: Dict, rng: jax.Array):
        targets = encoder.batched(batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"])
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
        )
        total, metrics = loss(rng, out, targets)
        return out, metrics

    return eval_step
