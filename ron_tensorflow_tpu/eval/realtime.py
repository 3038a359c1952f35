"""Realtime evaluator — the `ron_eval` equivalent that produced the
published 0.7+ mAP (ref: ron_eval.py:428-594).

Reads images + XML directly from a VOCdevkit tree, runs the jitted
whole-image-NMS detection path per image, accumulates
`all_boxes[cls][image] = (x1, y1, x2, y2, score)` in ORIGINAL pixel
coordinates with the reference's y/x axis swap (ref: ron_eval.py:563-580),
then runs the official offline VOC evaluation.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data.pipeline import decode_jpeg
from ..data.preprocess import whiten
from ..inference.detector import RealtimeConfig, RealtimeDetector
from .voc_eval import PascalVocEvaluator


class RealtimeEvaluator:
    def __init__(self, model, spec, config: RealtimeConfig = RealtimeConfig()):
        self.detector = RealtimeDetector(model, spec, config)
        self.spec = spec

    def detect_image(self, variables, image01: np.ndarray, orig_shape=None):
        """One decoded [H,W,3] float[0,1] image -> per-class pixel boxes.

        orig_shape: (H0, W0) of the ORIGINAL frame — scales the min-size
        filter like the reference (ref: ron_eval.py:369-375, 471).
        Returns {cls: np.ndarray [k, 5] of (x1, y1, x2, y2, score)}.
        """
        h, w = image01.shape[:2]
        cfg = self.detector.config
        h0, w0 = orig_shape if orig_shape is not None else (h, w)
        net_h, net_w = self.spec.img_shape
        min_size = cfg.min_size * float(np.sqrt((h0 * w0) / (net_h * net_w)))
        # image01 must already be at the model input resolution; whiten + batch
        batched = jnp.expand_dims(whiten(jnp.asarray(image01)), 0)
        scores, labels, boxes, valid = self.detector(
            variables, batched, jnp.float32(min_size)
        )
        scores = np.asarray(scores[0])
        labels = np.asarray(labels[0])
        boxes = np.asarray(boxes[0])
        valid = np.asarray(valid[0])
        out: Dict[int, List] = {}
        for i in range(len(scores)):
            if not valid[i]:
                continue
            ymin, xmin, ymax, xmax = boxes[i]
            # scale to original pixels with the axis swap
            # (ref: ron_eval.py:563-580)
            out.setdefault(int(labels[i]), []).append(
                [xmin * w, ymin * h, xmax * w, ymax * h, scores[i]]
            )
        return {k: np.asarray(v, np.float32) for k, v in out.items()}

    def evaluate_voc(
        self,
        variables,
        voc_root: str,
        set_type: str = "test",
        max_images: Optional[int] = None,
        output_dir: Optional[str] = None,
        use_07_metric: bool = True,
    ):
        """Full VOCdevkit evaluation loop (ref: ron_eval.py:529-594)."""
        evaluator = PascalVocEvaluator(voc_root, set_type, output_dir)
        image_ids = evaluator.image_ids
        if max_images:
            image_ids = image_ids[:max_images]
            evaluator.image_ids = image_ids

        num_classes = self.spec.num_classes
        all_boxes = [
            [np.zeros((0, 5), np.float32) for _ in image_ids] for _ in range(num_classes)
        ]
        t0 = time.time()
        for ii, image_id in enumerate(image_ids):
            jpeg_path = os.path.join(
                evaluator.root, "JPEGImages", image_id + ".jpg"
            )
            with open(jpeg_path, "rb") as f:
                data = f.read()
            from ..data.pipeline import decode_jpeg_raw
            from ..data.resize import tf1_bilinear_resize

            raw = decode_jpeg_raw(data)
            h0, w0 = raw.shape[:2]
            # TF1-legacy bilinear (WARP_RESIZE), matching the reference's
            # preprocess_for_eval numerics (ref: tf_image.py:269-281).
            img = tf1_bilinear_resize(raw, self.spec.img_shape) / 255.0
            per_class = self.detect_image(variables, img, orig_shape=(h0, w0))
            for cls, rows in per_class.items():
                rows = rows.copy()
                rows[:, [0, 2]] *= w0 / 1.0
                rows[:, [1, 3]] *= h0 / 1.0
                # detect_image scaled by the resized dims; renormalize
                rows[:, [0, 2]] /= self.spec.img_shape[1]
                rows[:, [1, 3]] /= self.spec.img_shape[0]
                all_boxes[cls][ii] = rows
            if (ii + 1) % 100 == 0:
                print(f"[ron-eval] {ii + 1}/{len(image_ids)}  "
                      f"{(time.time() - t0) / (ii + 1):.3f} sec/image")

        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
                pickle.dump(all_boxes, f)
        return evaluator.evaluate(all_boxes, use_07_metric=use_07_metric)
