"""Detection ↔ ground-truth TP/FP matching for mAP evaluation.

TPU-native version of the reference's per-class greedy matcher
(ref: tf_extended/bboxes.py:305-450 `bboxes_matching` /
`bboxes_matching_batch`): the `tf.while_loop` + TensorArray over detections
becomes a `lax.fori_loop` with static shapes, vmappable over classes and
batch. Matching semantics are identical to Pascal VOC: detections visited in
descending-score order; a detection is TP iff its best same-class gt has
IoU > threshold and is not yet matched; difficult gt produce neither TP nor
FP.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import jaccard_one_to_many


class MatchResult(NamedTuple):
    n_gt: jnp.ndarray  # [] int32 — non-difficult gt count for the class
    tp: jnp.ndarray  # [K] bool
    fp: jnp.ndarray  # [K] bool


@partial(jax.jit, static_argnames=("matching_threshold",))
def match_detections(
    label: jnp.ndarray,
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    glabels: jnp.ndarray,
    gboxes: jnp.ndarray,
    gdifficults: jnp.ndarray,
    matching_threshold: float = 0.5,
) -> MatchResult:
    """Match one image's detections of one class against its ground truth.

    Args:
      label: scalar int — the class being evaluated.
      scores: [K] detection scores, descending (zero padding allowed).
      boxes: [K, 4] detection boxes.
      glabels: [G] gt labels (0 = padding).
      gboxes: [G, 4] gt boxes.
      gdifficults: [G] bool/int difficult flags.
    """
    k = scores.shape[0]
    gdiff = gdifficults.astype(bool)
    same_class = glabels == label
    n_gt = jnp.sum((same_class & ~gdiff).astype(jnp.int32))

    def body(i, state):
        gmatch, tp, fp = state
        jac = jaccard_one_to_many(boxes[i], gboxes)
        jac = jac * same_class.astype(jac.dtype)
        idxmax = jnp.argmax(jac)
        match = jac[idxmax] > matching_threshold
        existing = gmatch[idxmax]
        not_difficult = ~gdiff[idxmax]
        tp_i = not_difficult & match & ~existing
        fp_i = not_difficult & (existing | ~match)
        tp = tp.at[i].set(tp_i)
        fp = fp.at[i].set(fp_i)
        gmatch = gmatch.at[idxmax].set(gmatch[idxmax] | (not_difficult & match))
        return gmatch, tp, fp

    gmatch0 = jnp.zeros(glabels.shape, dtype=bool)
    tp0 = jnp.zeros((k,), dtype=bool)
    fp0 = jnp.zeros((k,), dtype=bool)
    _, tp, fp = jax.lax.fori_loop(0, k, body, (gmatch0, tp0, fp0))
    return MatchResult(n_gt=n_gt, tp=tp, fp=fp)


def match_detections_batch(
    label,
    scores,
    boxes,
    glabels,
    gboxes,
    gdifficults,
    matching_threshold: float = 0.5,
) -> MatchResult:
    """Batched matcher: scores [B, K], boxes [B, K, 4], glabels [B, G], ...

    (ref: tf_extended/bboxes.py:407-450 `bboxes_matching_batch` — the
    `tf.map_fn` becomes a vmap.)
    """
    fn = lambda s, b, gl, gb, gd: match_detections(
        label, s, b, gl, gb, gd, matching_threshold
    )
    return jax.vmap(fn)(scores, boxes, glabels, gboxes, gdifficults)


def match_all_classes(
    num_classes: int,
    scores,
    boxes,
    glabels,
    gboxes,
    gdifficults,
    matching_threshold: float = 0.5,
) -> MatchResult:
    """Match per-class detection stacks for classes 1..num_classes-1.

    Args:
      scores: [C-1, K] per-class scores (class c at row c-1).
      boxes: [C-1, K, 4].
    Returns stacked MatchResult with leading class axis [C-1, ...].
    """
    labels = jnp.arange(1, num_classes)
    fn = lambda lab, s, b: match_detections(
        lab, s, b, glabels, gboxes, gdifficults, matching_threshold
    )
    return jax.vmap(fn)(labels, scores, boxes)
