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
        import jax

        self.detector = RealtimeDetector(model, spec, config)
        self.spec = spec
        # One fused dispatch per batch: whiten on device inside the same XLA
        # program as the detector (host-side eager whiten costs several
        # dispatches through the accelerator link per batch).
        self._detect01 = jax.jit(
            lambda v, x01, ms: self.detector(v, whiten(x01), ms)
        )

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
        return self._to_per_class(
            np.asarray(scores[0]), np.asarray(labels[0]),
            np.asarray(boxes[0]), np.asarray(valid[0]), h, w,
        )

    @staticmethod
    def _to_per_class(scores, labels, boxes, valid, h, w) -> Dict[int, np.ndarray]:
        out: Dict[int, List] = {}
        for i in range(len(scores)):
            if not valid[i]:
                continue
            ymin, xmin, ymax, xmax = boxes[i]
            # scale to pixels with the axis swap (ref: ron_eval.py:563-580)
            out.setdefault(int(labels[i]), []).append(
                [xmin * w, ymin * h, xmax * w, ymax * h, scores[i]]
            )
        return {k: np.asarray(v, np.float32) for k, v in out.items()}

    def detect_batch(self, variables, images01: np.ndarray, orig_shapes):
        """N decoded [B,Hn,Wn,3] float[0,1] net-resolution images (mixed
        original frames) -> list of per-class pixel-box dicts.

        One device dispatch for the whole batch — the reference ran
        sess.run per image (ref: ron_eval.py:539); per-image min-size
        scaling rides along as a [B] vector.
        """
        h, w = images01.shape[1:3]
        return self._harvest_batch(
            self._dispatch_batch(variables, images01, orig_shapes), h, w
        )

    def _dispatch_batch(self, variables, images01: np.ndarray, orig_shapes):
        """Async half of detect_batch: enqueue one batch, return the lazy
        device arrays (JAX dispatch is asynchronous — the device starts
        immediately; nothing blocks until _harvest_batch)."""
        cfg = self.detector.config
        net_h, net_w = self.spec.img_shape
        min_sizes = np.asarray(
            [
                cfg.min_size * float(np.sqrt((h0 * w0) / (net_h * net_w)))
                for (h0, w0) in orig_shapes
            ],
            np.float32,
        )
        return self._detect01(
            variables, jnp.asarray(images01), jnp.asarray(min_sizes)
        )

    def _harvest_batch(self, dispatched, h, w):
        """Blocking half: pull the device results and build the per-class
        pixel-box dicts."""
        scores, labels, boxes, valid = dispatched
        scores, labels = np.asarray(scores), np.asarray(labels)
        boxes, valid = np.asarray(boxes), np.asarray(valid)
        return [
            self._to_per_class(scores[i], labels[i], boxes[i], valid[i], h, w)
            for i in range(scores.shape[0])
        ]

    def evaluate_voc(
        self,
        variables,
        voc_root: str,
        set_type: str = "test",
        max_images: Optional[int] = None,
        output_dir: Optional[str] = None,
        use_07_metric: bool = True,
        batch_size: int = 8,
        decode_workers: int = 4,
        debug_dir: Optional[str] = None,
        debug_max_images: int = 64,
    ):
        """Full VOCdevkit evaluation loop (ref: ron_eval.py:529-594).

        debug_dir: dump boxed JPEGs of the final per-image detections for
        the first `debug_max_images` images (the reference's in-loop debug
        dump, ref: ron_eval.py:553-555).

        De-serialized host path: a thread pool reads + JPEG-decodes +
        resizes (cv2 releases the GIL), the next batch decodes while the
        current one runs on device, and detection dispatches batch_size
        images at a time — the reference decoded and ran strictly one image
        per sess.run (ref: ron_eval.py:537-539)."""
        from concurrent.futures import ThreadPoolExecutor

        import jax

        # One-time device placement: checkpoints restore as host numpy, and
        # a numpy param tree passed to a jitted call re-uploads ~100s of MB
        # every batch (the dominant cost on a PCIe/tunnel link).
        variables = jax.device_put(variables)

        evaluator = PascalVocEvaluator(voc_root, set_type, output_dir)
        image_ids = evaluator.image_ids
        if max_images:
            image_ids = image_ids[:max_images]
            evaluator.image_ids = image_ids

        num_classes = self.spec.num_classes
        all_boxes = [
            [np.zeros((0, 5), np.float32) for _ in image_ids] for _ in range(num_classes)
        ]

        from ..data.pipeline import decode_jpeg_raw
        from ..data.resize import tf1_bilinear_resize

        def load(image_id):
            path = os.path.join(evaluator.root, "JPEGImages", image_id + ".jpg")
            with open(path, "rb") as f:
                raw = decode_jpeg_raw(f.read())
            # TF1-legacy bilinear (WARP_RESIZE), matching the reference's
            # preprocess_for_eval numerics (ref: tf_image.py:269-281).
            img = tf1_bilinear_resize(raw, self.spec.img_shape) / 255.0
            return img.astype(np.float32), raw.shape[:2]

        groups = [
            image_ids[i : i + batch_size]
            for i in range(0, len(image_ids), batch_size)
        ]
        t0 = time.time()
        n_done = 0

        def debug_dump(ii, image01, per_class):
            from ..utils.visualization import save_image_with_boxes

            nh, nw = self.spec.img_shape
            rows_boxes, rows_labels, rows_scores = [], [], []
            for cls, rows in per_class.items():
                for x1, y1, x2, y2, s in rows:
                    rows_boxes.append([y1 / nh, x1 / nw, y2 / nh, x2 / nw])
                    rows_labels.append(cls)
                    rows_scores.append(s)
            save_image_with_boxes(
                image01,
                np.asarray(rows_boxes, np.float32).reshape(-1, 4),
                np.asarray(rows_labels, np.int32),
                np.asarray(rows_scores, np.float32),
                directory=debug_dir,
                index=ii,
            )

        def harvest(gi, ids, loaded, dispatched):
            """Pull one dispatched batch and fill all_boxes — runs while the
            NEXT batch computes on device."""
            nonlocal n_done
            nh, nw = self.spec.img_shape
            per_class_list = self._harvest_batch(dispatched, nh, nw)
            for k, image_id in enumerate(ids):
                ii = gi * batch_size + k
                h0, w0 = loaded[k][1]
                if debug_dir is not None and ii < debug_max_images:
                    debug_dump(ii, loaded[k][0], per_class_list[k])
                for cls, rows in per_class_list[k].items():
                    rows = rows.copy()
                    # boxes were scaled by the net dims; rescale to the
                    # original frame
                    rows[:, [0, 2]] *= w0 / nw
                    rows[:, [1, 3]] *= h0 / nh
                    all_boxes[cls][ii] = rows
            n_done += len(ids)
            if (gi + 1) % max(1, 100 // batch_size) == 0:
                print(f"[ron-eval] {n_done}/{len(image_ids)}  "
                      f"{(time.time() - t0) / n_done:.3f} sec/image")

        with ThreadPoolExecutor(max_workers=decode_workers) as pool:
            pending = [pool.submit(load, i) for i in groups[0]] if groups else []
            prev = None  # one-deep pipeline: (gi, ids, loaded, device arrays)
            for gi, ids in enumerate(groups):
                loaded = [f.result() for f in pending]
                if gi + 1 < len(groups):  # double buffer: decode ahead
                    pending = [pool.submit(load, i) for i in groups[gi + 1]]
                images = np.stack([im for im, _ in loaded])
                shapes = [s for _, s in loaded]
                if len(ids) < batch_size:  # pad the final short batch
                    pad = batch_size - len(ids)
                    images = np.concatenate(
                        [images, np.zeros((pad, *images.shape[1:]), np.float32)]
                    )
                    shapes = shapes + [self.spec.img_shape] * pad
                dispatched = self._dispatch_batch(variables, images, shapes)
                if prev is not None:
                    harvest(*prev)
                prev = (gi, ids, loaded, dispatched)
            if prev is not None:
                harvest(*prev)

        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
                pickle.dump(all_boxes, f)
        return evaluator.evaluate(all_boxes, use_07_metric=use_07_metric)
