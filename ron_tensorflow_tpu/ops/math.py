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


def abs_smooth(x):
    """Smoothed L1 with the reference's differentiable min/abs form
    (ref: nets/custom_layers.py:51-63)."""
    absx = jnp.abs(x)
    minx = jnp.minimum(absx, 1.0)
    return 0.5 * ((absx - 1.0) * minx + absx)
