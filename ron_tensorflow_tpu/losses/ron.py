"""RON training loss: objectness + objectness-gated classification +
localization.

TPU-native re-design of the reference's `ron_losses`
(ref: nets/ron_vgg_320.py:635-779). Structure preserved exactly:

- positives: anchors with encoded label > 0; ignore (-1) excluded everywhere.
- objectness branch: softmax CE on is-positive, over positives + *randomly*
  sampled negatives at `negative_ratio`:1 (the reference uses random — not
  hard — negative mining for RON, ref: :700-705); weight `alpha`.
- classification branch: positives additionally gated by predicted
  objectness > `objectness_threshold`; negatives = objectness-fired anchors
  with label 0, randomly sampled 3:1 against the *gated* positive count;
  weight `1 - alpha - beta` (ref: :721-754).
- localization: modified smooth-L1 (sigma=3) summed over the 4 coords,
  averaged over gated positives; weight `beta` (ref: :766-778).
- every branch is zero when it has no selected examples — the reference
  guards with `tf.cond(n_positives > 0)` and would NaN on an empty gated
  mask; we use masked means with safe divides instead (documented
  deviation, same value on non-degenerate batches).

The reference's stateful `tf.random_uniform` draws become explicit PRNG
keys, so the loss is a pure function — reproducible and shardable.
Flattening: all [B, N] inputs are reduced over both axes jointly, matching
the reference's global flatten+concat (ref: :652-675).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.math import smooth_l1, softmax_ce as _softmax_ce


@dataclasses.dataclass(frozen=True)
class RonLossConfig:
    """Hyper-parameters (defaults = the published training flags,
    ref: ron_net.py:52-63)."""

    num_classes: int = 21
    negative_ratio: float = 3.0
    alpha: float = 1.0 / 3.0  # objectness weight
    beta: float = 1.0 / 5.0  # localization weight (train flag default)
    objectness_threshold: float = 0.03
    sigma: float = 3.0  # smooth-L1 transition


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(mask.astype(values.dtype))
    return jnp.sum(values * mask.astype(values.dtype)) / jnp.maximum(denom, 1.0)


def ron_losses(
    rng: jax.Array,
    logits: jnp.ndarray,
    locations: jnp.ndarray,
    objness_logits: jnp.ndarray,
    objness_pred: jnp.ndarray,
    gclasses: jnp.ndarray,
    glocations: jnp.ndarray,
    config: RonLossConfig = RonLossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the three-term RON loss.

    Args:
      rng: PRNG key for the two random negative-sampling draws.
      logits: [B, N, C] class logits (flat all-layer anchor order).
      locations: [B, N, 4] predicted offsets.
      objness_logits: [B, N, 2].
      objness_pred: [B, N] P(object) — post-softmax.
      gclasses: [B, N] int encoded labels (0 negative, -1 ignore).
      glocations: [B, N, 4] encoded regression targets.

    Returns:
      (total_loss, dict of the three unweighted-by-name components and
       diagnostic counts).
    """
    cfg = config
    dtype = jnp.float32
    k_obj, k_cls = jax.random.split(rng)

    gclasses = jax.lax.stop_gradient(gclasses)
    glocations = jax.lax.stop_gradient(glocations)

    positive_mask = gclasses > 0
    negative_mask = gclasses == 0
    n_positives = jnp.sum(positive_mask.astype(dtype))
    n_negatives = jnp.sum(negative_mask.astype(dtype))

    # --- objectness branch: random 3:1 negative sampling (ref: :700-717) ---
    n_neg_select = jnp.minimum(
        (cfg.negative_ratio * n_positives).astype(jnp.int32), n_negatives.astype(jnp.int32)
    ).astype(dtype)
    p_select = jnp.where(n_negatives > 0, n_neg_select / jnp.maximum(n_negatives, 1.0), 0.0)
    rand = jax.random.uniform(k_obj, gclasses.shape, dtype)
    obj_mask = (negative_mask & (rand < p_select)) | positive_mask
    obj_labels = positive_mask.astype(jnp.int32)
    obj_ce = _softmax_ce(objness_logits, obj_labels)
    objness_loss = jnp.where(
        n_positives > 0, cfg.alpha * _masked_mean(obj_ce, obj_mask), 0.0
    )

    # --- classification branch: objectness-gated (ref: :721-754) ---
    objectness_mask = jax.lax.stop_gradient(objness_pred) > cfg.objectness_threshold
    cls_positive_mask = positive_mask & objectness_mask
    cls_negative_mask = objectness_mask & negative_mask
    n_cls_pos = jnp.sum(cls_positive_mask.astype(dtype))
    n_cls_neg = jnp.sum(cls_negative_mask.astype(dtype))
    n_cls_neg_select = jnp.minimum(
        (cfg.negative_ratio * n_cls_pos).astype(jnp.int32), n_cls_neg.astype(jnp.int32)
    ).astype(dtype)
    p_cls = jnp.where(n_cls_neg > 0, n_cls_neg_select / jnp.maximum(n_cls_neg, 1.0), 0.0)
    rand2 = jax.random.uniform(k_cls, gclasses.shape, dtype)
    cls_mask = (cls_negative_mask & (rand2 < p_cls)) | cls_positive_mask
    cls_labels = jnp.clip(gclasses, 0, cfg.num_classes - 1)
    cls_ce = _softmax_ce(logits, cls_labels)
    cls_weight = 1.0 - cfg.alpha - cfg.beta
    cls_loss = jnp.where(
        n_positives > 0, cls_weight * _masked_mean(cls_ce, cls_mask), 0.0
    )

    # --- localization branch (ref: :766-778) ---
    loc_l1 = jnp.sum(
        smooth_l1(locations.astype(dtype) - glocations.astype(dtype), cfg.sigma), axis=-1
    )
    loc_loss = jnp.where(
        n_cls_pos > 0, cfg.beta * _masked_mean(loc_l1, cls_positive_mask), 0.0
    )

    total = objness_loss + cls_loss + loc_loss
    metrics = {
        "loss/total": total,
        "loss/objectness": objness_loss,
        "loss/classification": cls_loss,
        "loss/localization": loc_loss,
        "counts/positives": n_positives,
        "counts/cls_positives": n_cls_pos,
    }
    return total, metrics
