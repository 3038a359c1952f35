"""SSD training loss with hard negative mining.

TPU-native re-design of the reference's `ssd_losses`
(ref: nets/ssd_vgg_300.py:578-659). Differences from the RON loss: positives
come from the matched IoU *scores* (> match_threshold), negatives are mined
*hard* (lowest background probability) rather than randomly, and every term
is normalized by the batch size rather than the selected count.

The reference's dynamic `tf.nn.top_k(-nvalues, k=n_neg)` (data-dependent k)
becomes a full ascending sort + a dynamic gather of the n_neg-th value —
static shapes, identical selection rule (`nvalues < kth_value`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.math import abs_smooth, softmax_ce as _softmax_ce


@dataclasses.dataclass(frozen=True)
class SsdLossConfig:
    num_classes: int = 21
    match_threshold: float = 0.5
    negative_ratio: float = 3.0
    alpha: float = 1.0  # localization weight


def ssd_losses(
    logits: jnp.ndarray,
    locations: jnp.ndarray,
    gclasses: jnp.ndarray,
    glocations: jnp.ndarray,
    gscores: jnp.ndarray,
    config: SsdLossConfig = SsdLossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SSD multibox loss.

    Args:
      logits: [B, N, C]; locations: [B, N, 4].
      gclasses: [B, N] int labels; glocations: [B, N, 4];
      gscores: [B, N] matched IoU from the encoder.
    """
    cfg = config
    dtype = jnp.float32
    batch_size = logits.shape[0]

    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_gclasses = jax.lax.stop_gradient(gclasses.reshape(-1))
    flat_gscores = jax.lax.stop_gradient(gscores.reshape(-1))
    flat_locs = locations.reshape(-1, 4)
    flat_glocs = jax.lax.stop_gradient(glocations.reshape(-1, 4))

    pmask = flat_gscores > cfg.match_threshold
    fpmask = pmask.astype(dtype)
    n_positives = jnp.sum(fpmask)

    # Hard negative mining (ref: nets/ssd_vgg_300.py:616-636).
    predictions = jax.nn.softmax(flat_logits.astype(dtype), axis=-1)
    nmask = (~pmask) & (flat_gscores > -0.5)
    fnmask = nmask.astype(dtype)
    nvalues = jnp.where(nmask, predictions[:, 0], 1.0 - fnmask)
    max_neg_entries = jnp.sum(fnmask).astype(jnp.int32)
    n_neg = (cfg.negative_ratio * n_positives).astype(jnp.int32) + batch_size
    n_neg = jnp.minimum(n_neg, max_neg_entries)
    # kth smallest background prob == -top_k(-x)[n_neg-1]
    sorted_vals = jnp.sort(nvalues)
    kth = sorted_vals[jnp.maximum(n_neg - 1, 0)]
    nmask = nmask & (nvalues < kth)
    fnmask = nmask.astype(dtype)

    ce_pos = _softmax_ce(flat_logits, jnp.clip(flat_gclasses, 0, cfg.num_classes - 1))
    pos_loss = jnp.sum(ce_pos * fpmask) / batch_size

    no_classes = pmask.astype(jnp.int32)
    ce_neg = _softmax_ce(flat_logits, no_classes)
    neg_loss = jnp.sum(ce_neg * fnmask) / batch_size

    loc_l1 = jnp.sum(abs_smooth(flat_locs.astype(dtype) - flat_glocs), axis=-1)
    loc_loss = cfg.alpha * jnp.sum(loc_l1 * fpmask) / batch_size

    total = pos_loss + neg_loss + loc_loss
    metrics = {
        "loss/total": total,
        "loss/ce_pos": pos_loss,
        "loss/ce_neg": neg_loss,
        "loss/localization": loc_loss,
        "counts/positives": n_positives,
    }
    return total, metrics
