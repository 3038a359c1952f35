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


def exact_top_k_chunked(x, k: int, num_chunks: int = 8):
    """Exact top-k along the last axis via per-chunk top-k + a final top-k
    over the candidate pool. BIT-IDENTICAL to `jax.lax.top_k` — values,
    indices, order, and tie resolution (ties go to the smallest index):
    every global top-k element is inside its own chunk's top-k, and the
    candidate pool is laid out chunk-major (= ascending original index among
    equal scores, both across and within chunks), so the final top-k's
    earliest-position tie-break picks the same elements in the same order.

    Motivation: XLA's TopK on TPU has a cost that grows with the scan length
    n; splitting n into `num_chunks` independent partial top-ks (one
    vectorized call) and finishing on the `num_chunks*k` survivors does
    less total sorting work for the detection shapes (n ~ 21k anchors,
    k ~ 200; see docs/tpu_performance.md). Falls back to plain `top_k`
    when chunking cannot shrink the problem (n < num_chunks * k) —
    callers may pass any `num_chunks` without correctness risk.

    Replaces the approx/exact tradeoff of `lax.approx_max_k` for the
    detection selection stage (ref semantics: nets/ssd_common.py:504-589
    per-class top-k): approx selection measured -0.002 mAP on crowded
    scenes (NOTES.md round 5), this path is exact by construction.
    """
    *lead, n = x.shape
    if num_chunks <= 1 or n < num_chunks * k:
        return jax.lax.top_k(x, k)
    pad = (-n) % num_chunks
    if pad:
        x = jnp.pad(
            x, [(0, 0)] * len(lead) + [(0, pad)], constant_values=-jnp.inf
        )
    m = (n + pad) // num_chunks
    xr = x.reshape(*lead, num_chunks, m)
    chunk_vals, chunk_idx = jax.lax.top_k(xr, k)  # [..., chunks, k]
    base = (jnp.arange(num_chunks, dtype=chunk_idx.dtype) * m)[:, None]
    pool_idx = (chunk_idx + base).reshape(*lead, num_chunks * k)
    pool_vals = chunk_vals.reshape(*lead, num_chunks * k)
    vals, pos = jax.lax.top_k(pool_vals, k)
    return vals, jnp.take_along_axis(pool_idx, pos, axis=-1)


def abs_smooth(x):
    """Smoothed L1 with the reference's differentiable min/abs form
    (ref: nets/custom_layers.py:51-63)."""
    absx = jnp.abs(x)
    minx = jnp.minimum(absx, 1.0)
    return 0.5 * ((absx - 1.0) * minx + absx)
