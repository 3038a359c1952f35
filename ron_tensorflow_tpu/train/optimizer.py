"""Optimizer and learning-rate-schedule factories.

TPU-native replacement for the reference's flag-driven factories
(ref: tf_utils.py:92-171 `configure_learning_rate`/`configure_optimizer`,
ron_net.py:354-356 piecewise LR) built on optax. All seven reference
optimizers are available (adadelta, adagrad, adam, ftrl, momentum, rmsprop,
sgd — ftrl implemented locally since optax has none), plus the three decay
policies and the piecewise-constant schedule of the canonical trainer.

Weight decay is applied as additive `wd * w` on conv/dense kernels only —
the exact gradient contribution of slim's `l2_regularizer(wd)` on weights
(ref: nets/ron_vgg_320.py:602-608; biases and BN params excluded, as slim
only regularized `weights`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors the reference's optimization flags (ref: ron_net.py:66-150)."""

    optimizer: str = "momentum"
    learning_rate: float = 1e-3
    end_learning_rate: float = 1e-6
    learning_rate_decay_type: str = "piecewise"  # fixed|exponential|polynomial|piecewise
    learning_rate_decay_factor: float = 0.1
    decay_steps: int = 90000
    lr_boundaries: Sequence[int] = (90000, 115000)
    lr_factors: Sequence[float] = (1.0, 0.1, 0.001)
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # linear LR warmup from 0 over the first N steps (0 = off). Not a
    # reference flag — needed when training detection heads from scratch
    # (no pretrained backbone), where the first hard-mined batches explode.
    warmup_steps: int = 0
    # global-norm gradient clipping (0 = off). Not a reference flag; same
    # motivation as warmup_steps (the SSD loss sums over mined anchors and
    # early gradients can overflow bf16 activations).
    clip_global_norm: float = 0.0
    # per-optimizer knobs (reference flag defaults, ref: ron_net.py:66-145)
    adadelta_rho: float = 0.95
    adagrad_initial_accumulator_value: float = 0.1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    opt_epsilon: float = 1.0
    ftrl_learning_rate_power: float = -0.5
    ftrl_initial_accumulator_value: float = 0.1
    ftrl_l1: float = 0.0
    ftrl_l2: float = 0.0
    rmsprop_decay: float = 0.9
    rmsprop_momentum: float = 0.9


def make_learning_rate_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    """Build the LR schedule (ref: tf_utils.py:92-124 + ron_net.py:354-356)."""
    base = _base_schedule(cfg)
    if not cfg.warmup_steps:
        return base

    def with_warmup(step):
        scale = jnp.minimum(1.0, (step + 1) / cfg.warmup_steps)
        return scale * base(step)

    return with_warmup


def _base_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    if cfg.learning_rate_decay_type == "fixed":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.learning_rate_decay_type == "exponential":
        return optax.exponential_decay(
            cfg.learning_rate,
            transition_steps=cfg.decay_steps,
            decay_rate=cfg.learning_rate_decay_factor,
            staircase=True,
        )
    if cfg.learning_rate_decay_type == "polynomial":
        return optax.polynomial_schedule(
            init_value=cfg.learning_rate,
            end_value=cfg.end_learning_rate,
            power=1.0,
            transition_steps=cfg.decay_steps,
        )
    if cfg.learning_rate_decay_type == "piecewise":
        values = [cfg.learning_rate * f for f in cfg.lr_factors]

        def schedule(step):
            lr = jnp.asarray(values[0], jnp.float32)
            for b, v in zip(cfg.lr_boundaries, values[1:]):
                lr = jnp.where(step >= b, v, lr)
            # floored at end_learning_rate (ref: ron_net.py:356 tf.maximum)
            return jnp.maximum(lr, cfg.end_learning_rate)

        return schedule
    raise ValueError(f"unknown decay type {cfg.learning_rate_decay_type!r}")


def _ftrl(learning_rate, learning_rate_power, initial_accumulator_value, l1, l2):
    """Minimal FTRL-proximal, matching TF's FtrlOptimizer update rule."""

    def init_fn(params):
        accum = jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params
        )
        linear = jax.tree.map(jnp.zeros_like, params)
        return (accum, linear)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")
        accum, linear = state
        new_accum = jax.tree.map(lambda a, g: a + g * g, accum, grads)

        def upd(g, a, na, l, p):
            sigma = (na**-learning_rate_power - a**-learning_rate_power) / learning_rate
            new_l = l + g - sigma * p
            quad = na**-learning_rate_power / learning_rate + 2.0 * l2
            new_p = jnp.where(
                jnp.abs(new_l) > l1, -(new_l - jnp.sign(new_l) * l1) / quad, 0.0
            )
            return new_p - p, new_l

        out = jax.tree.map(upd, grads, accum, new_accum, linear, params)
        updates = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_linear = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, (new_accum, new_linear)

    return optax.GradientTransformation(init_fn, update_fn)


def kernel_weight_decay_mask(params) -> dict:
    """True for conv/dense kernels — the tensors slim regularized."""
    def is_kernel(path, _):
        return any(getattr(k, "key", None) == "kernel" for k in path)

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def make_optimizer(cfg: OptimizerConfig, params_example=None) -> optax.GradientTransformation:
    """Build the full gradient transformation: optimizer core + schedule +
    masked weight decay (ref: tf_utils.py:126-171)."""
    schedule = make_learning_rate_schedule(cfg)
    name = cfg.optimizer
    if name == "adadelta":
        core = optax.scale_by_adadelta(rho=cfg.adadelta_rho, eps=cfg.opt_epsilon)
    elif name == "adagrad":
        core = optax.scale_by_rss(
            initial_accumulator_value=cfg.adagrad_initial_accumulator_value
        )
    elif name == "adam":
        core = optax.scale_by_adam(
            b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.opt_epsilon
        )
    elif name == "ftrl":
        # FTRL folds the LR into its update; no schedule composition.
        tx = _ftrl(
            cfg.learning_rate,
            cfg.ftrl_learning_rate_power,
            cfg.ftrl_initial_accumulator_value,
            cfg.ftrl_l1,
            cfg.ftrl_l2,
        )
        if cfg.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay, kernel_weight_decay_mask), tx
            )
        return tx
    elif name == "momentum":
        core = optax.trace(decay=cfg.momentum, nesterov=False)
    elif name == "rmsprop":
        core = optax.chain(
            optax.scale_by_rms(decay=cfg.rmsprop_decay, eps=cfg.opt_epsilon),
            optax.trace(decay=cfg.rmsprop_momentum),
        )
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts = []
    if cfg.clip_global_norm:
        parts.append(optax.clip_by_global_norm(cfg.clip_global_norm))
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay, kernel_weight_decay_mask))
    parts.append(core)
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
