"""End-to-end detection pipelines, fully jitted.

Two variants mirroring the reference's two evaluation paths:

- `Detector` — the streaming-eval pipeline (ref: eval_ron_network.py:224-236
  + nets/ron_vgg_320.py:234-256 `detected_bboxes`): binary objectness gate →
  per-class select → clip → min-size filter → top-k sort → class-wise NMS
  ('min' overlap mode, the `bboxes_nms` default) → [B, C-1, keep_top_k].
- `RealtimeDetector` — the realtime path that produced the published mAP
  (ref: ron_eval.py:428-594): score = objectness × class prob, objectness
  gate 0.95 → clip → min-size/center filter → whole-image union-mode NMS →
  top detections with labels.

Everything from pixels to padded detections is one XLA program per batch —
the reference ran this on CPU with while-loops (ref: eval_ron_network.py:223
"Performing post-processing on CPU: loop-intensive").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.ron import DetectorSpec
from ..ops import boxes as boxops
from ..ops import nms as nmsops
from ..ops.decode import decode_boxes
from ..ops.select import select_per_class


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """Streaming-eval defaults (ref: eval_ron_network.py:64-75)."""

    select_threshold: float = 0.01
    objectness_threshold: float = 0.03
    top_k: int = 200
    keep_top_k: int = 100
    nms_threshold: float = 0.4
    nms_mode: str = "min"
    min_size: float = 0.03


@dataclasses.dataclass(frozen=True)
class RealtimeConfig:
    """Realtime-eval defaults (ref: ron_eval.py:64-91)."""

    select_threshold: float = 0.5
    objectness_threshold: float = 0.95
    top_k: int = 400
    keep_top_k: int = 20
    nms_threshold: float = 0.45
    nms_mode: str = "union"
    min_size: float = 0.03


class Detector:
    """Class-wise detection head over a trained model."""

    def __init__(self, model, spec: DetectorSpec, config: DetectionConfig = DetectionConfig()):
        self.model = model
        self.spec = spec
        self.config = config
        self._anchors = jnp.asarray(spec.anchor_layout().cyxhw)

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, variables, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images [B, H, W, 3] (whitened) ->
        (scores [B, C-1, keep_top_k], boxes [B, C-1, keep_top_k, 4])."""
        out = self.model.apply(variables, images, train=False)
        return self.postprocess(out)

    def postprocess(self, out):
        cfg = self.config
        decoded = decode_boxes(out.locations, self._anchors, self.spec.prior_scaling)

        # Binary objectness gate on class probabilities
        # (ref: eval_ron_network.py:228-229).
        gate = (out.objness_pred > cfg.objectness_threshold).astype(
            out.predictions.dtype
        )
        predictions = out.predictions * gate[..., None]

        def per_image(preds, dec):
            scores, b = select_per_class(preds, dec, cfg.select_threshold)
            b = boxops.clip_to_ref(b)
            # min-size filter zeroes scores (fixed-shape analogue of
            # boolean_mask + pad, ref: nets/ron_vgg_320.py:196-233)
            scores = scores * boxops.min_size_mask(b, cfg.min_size).astype(scores.dtype)
            s_sorted, b_sorted = jax.vmap(lambda s, bb: nmsops.sort_by_score(s, bb, cfg.top_k))(
                scores, b
            )
            return nmsops.nms_per_class(
                s_sorted, b_sorted, cfg.nms_threshold, cfg.keep_top_k, cfg.nms_mode
            )

        return jax.vmap(per_image)(predictions, decoded)


class RealtimeDetector:
    """Whole-image NMS detection head (the 0.7+ mAP path)."""

    def __init__(self, model, spec: DetectorSpec, config: RealtimeConfig = RealtimeConfig()):
        self.model = model
        self.spec = spec
        self.config = config
        self._anchors = jnp.asarray(spec.anchor_layout().cyxhw)

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, variables, images):
        """-> (scores, labels, boxes, valid) each [B, keep_top_k(,4)]."""
        out = self.model.apply(variables, images, train=False)
        return self.postprocess(out)

    def postprocess(self, out):
        cfg = self.config
        decoded = decode_boxes(out.locations, self._anchors, self.spec.prior_scaling)

        def per_image(preds, objness, dec):
            # score = objness * class prob; argmax class
            # (ref: ron_eval.py:111-144 flaten_predict)
            scores_nc = objness[:, None] * preds
            labels = jnp.argmax(scores_nc, axis=-1)
            max_scores = jnp.max(scores_nc, axis=-1)
            valid = (labels > 0) & (objness > cfg.objectness_threshold)
            # threshold on max class score (ref: ron_eval.py:151-153)
            valid &= max_scores > cfg.select_threshold
            b = boxops.clip_to_ref(dec)
            # min-size + center-inside filter (ref: ron_eval.py:369-392)
            valid &= boxops.min_size_mask(b, cfg.min_size)
            cy = (b[:, 0] + b[:, 2]) / 2.0
            cx = (b[:, 1] + b[:, 3]) / 2.0
            valid &= (cy > 0.0) & (cy < 1.0) & (cx > 0.0) & (cx < 1.0)
            return nmsops.nms_with_labels(
                max_scores,
                labels,
                b,
                valid,
                nms_threshold=cfg.nms_threshold,
                top_k=cfg.top_k,
                keep_top_k=cfg.keep_top_k,
                mode=cfg.nms_mode,
            )

        return jax.vmap(per_image)(out.predictions, out.objness_pred, decoded)
