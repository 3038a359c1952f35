"""Small math utilities (ref: tf_extended/math.py:24-67).

`safe_divide` reproduces the reference's guarded divide; `cummax` replaces
the reference's `tf.scan`-based cumulative max with `lax.cummax`, which
lowers to a log-depth scan on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_divide(numerator, denominator):
    """numerator / denominator where denominator > 0, else 0
    (ref: tf_extended/math.py:24-38)."""
    ok = denominator > 0
    return jnp.where(ok, numerator / jnp.where(ok, denominator, 1.0), jnp.zeros_like(numerator))


def cummax(x, reverse: bool = False, axis: int = 0):
    """Cumulative maximum along `axis` (ref: tf_extended/math.py:41-67)."""
    return jax.lax.cummax(x, axis=axis, reverse=reverse)


def smooth_l1(diff, sigma: float = 1.0):
    """Modified smooth-L1 of Fast R-CNN:
      0.5 * (sigma * x)^2      if |x| < 1 / sigma^2
      |x| - 0.5 / sigma^2      otherwise
    (ref: nets/custom_layers.py:31-49 `modified_smooth_l1`; RON uses sigma=3,
    ref: nets/ron_vgg_320.py:769.)
    """
    sigma2 = sigma * sigma
    absd = jnp.abs(diff)
    quad = 0.5 * sigma2 * diff * diff
    lin = absd - 0.5 / sigma2
    return jnp.where(absd < 1.0 / sigma2, quad, lin)


def softmax_ce(logits, labels):
    """Sparse softmax cross-entropy in f32, gather-free.

    Computed as `logsumexp(logits) - logits[label]` with the label pick as a
    one-hot contraction. The textbook
    `take_along_axis(log_softmax(logits), labels)` is mathematically
    identical but its gather costs ~19 ms at [32, 21250, 21] when fused into
    the RON train step on TPU (measured; the same gather is fast standalone —
    the lowering degrades inside large fused programs). The one-hot form is
    pure elementwise+reduce, fuses cleanly, and its backward avoids the
    scatter entirely.
    """
    x = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(x, axis=-1)
    picked = jnp.sum(
        x * jax.nn.one_hot(labels, x.shape[-1], dtype=x.dtype), axis=-1
    )
    return lse - picked


def abs_smooth(x):
    """Smoothed L1 with the reference's differentiable min/abs form
    (ref: nets/custom_layers.py:51-63)."""
    absx = jnp.abs(x)
    minx = jnp.minimum(absx, 1.0)
    return 0.5 * ((absx - 1.0) * minx + absx)
