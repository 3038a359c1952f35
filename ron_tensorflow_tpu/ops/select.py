"""Detection score selection / gating.

TPU-native version of the reference's per-class dict selection
(ref: nets/ssd_common.py:503-590 `tf_ssd_bboxes_select*`) and the
objectness-gated flatten of the realtime evaluator
(ref: ron_eval.py:111-144 `flaten_predict`). Class dictionaries become a
leading class axis on stacked arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


def select_per_class(
    predictions: jnp.ndarray,
    locations: jnp.ndarray,
    select_threshold: float = 0.0,
    ignore_class: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class score thresholding.

    Args:
      predictions: [..., N, C] class probabilities.
      locations: [..., N, 4] decoded boxes.
      select_threshold: scores <= threshold zeroed (reference uses strict >,
        ref: nets/ssd_common.py:539-546).

    Returns:
      scores: [..., C-1, N] per-class scores (background dropped).
      boxes: [..., C-1, N, 4] boxes, zeroed where score fails the threshold.
    """
    num_classes = predictions.shape[-1]
    assert ignore_class == 0, "only background=0 supported"
    scores = jnp.moveaxis(predictions[..., 1:num_classes], -1, -2)  # [..., C-1, N]
    fmask = (scores > select_threshold).astype(scores.dtype)
    scores = scores * fmask
    boxes = locations[..., None, :, :] * fmask[..., None]
    boxes = jnp.broadcast_to(
        boxes, scores.shape + (4,)
    )
    return scores, boxes


def select_all_classes(
    predictions: jnp.ndarray,
    locations: jnp.ndarray,
    select_threshold: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Combined-max selection: best non-background class per box
    (ref: nets/ssd_common.py:592-630 `tf_ssd_bboxes_select_layer_all_classes`).

    Returns (classes [..., N], scores [..., N], boxes [..., N, 4]).
    """
    if select_threshold is None or select_threshold == 0:
        classes = jnp.argmax(predictions, axis=-1)
        scores = jnp.max(predictions, axis=-1)
        scores = scores * (classes > 0).astype(scores.dtype)
    else:
        sub = predictions[..., 1:]
        classes = jnp.argmax(sub, axis=-1) + 1
        scores = jnp.max(sub, axis=-1)
        mask = scores > select_threshold
        classes = classes * mask.astype(classes.dtype)
        scores = scores * mask.astype(scores.dtype)
    return classes, scores, locations


class FlatPredictions(NamedTuple):
    scores: jnp.ndarray  # [N, C] objectness-weighted class scores
    labels: jnp.ndarray  # [N] argmax class
    valid: jnp.ndarray  # [N] bool gate mask


def objectness_gated_predictions(
    predictions: jnp.ndarray,
    objness: jnp.ndarray,
    objectness_threshold: float = 0.95,
) -> FlatPredictions:
    """Objectness-prior gating of class predictions, fixed-shape version of
    the realtime evaluator's `flaten_predict` (ref: ron_eval.py:111-144):
    score = objectness * class_prob; a box is valid when its argmax class is
    foreground AND its objectness exceeds the gate.

    Args:
      predictions: [N, C] class probabilities (flat over all layers).
      objness: [N] objectness probabilities.
    """
    scores = objness[:, None] * predictions  # [N, C]
    labels = jnp.argmax(scores, axis=-1)
    valid = (labels > 0) & (objness > objectness_threshold)
    return FlatPredictions(scores=scores, labels=labels, valid=valid)
