"""Streaming mAP evaluator — the `eval_ron_network` equivalent.

(ref: eval_ron_network.py:137-366.) Per batch: jitted detection (forward +
decode + gate + class-wise NMS) and jitted per-class TP/FP matching on
device; tiny TP/FP/score vectors stream to the host accumulator. Per-class
AP (VOC07 + VOC12 protocols) and mAP at the end — the reference's growing
`tf.assign` local variables replaced by `StreamingTpFp`.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.detector import DetectionConfig, Detector
from ..ops.ap import StreamingTpFp
from ..ops.matching import match_all_classes


class StreamingEvaluator:
    def __init__(
        self,
        model,
        spec,
        config: DetectionConfig = DetectionConfig(),
        matching_threshold: float = 0.5,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — shards every eval batch over
        the 'data' axis (multi-chip data-parallel inference; params are
        replicated). The reference ran eval strictly single-device
        (ref: eval_ron_network.py:137-366); batch_size must be divisible by
        the data-axis size."""
        if mesh is not None and config.nms_method in ("auto", "pallas"):
            import dataclasses

            # Pallas custom calls do not partition under GSPMD — pick the
            # XLA-native fixpoint for sharded eval.
            config = dataclasses.replace(config, nms_method="fixpoint")
        self.detector = Detector(model, spec, config)
        self.spec = spec
        self.matching_threshold = matching_threshold
        self.mesh = mesh
        self._match = jax.jit(
            lambda s, b, gl, gb, gd: jax.vmap(
                lambda s1, b1, gl1, gb1, gd1: match_all_classes(
                    spec.num_classes, s1, b1, gl1, gb1, gd1, matching_threshold
                )
            )(s, b, gl, gb, gd)
        )

    def run(
        self,
        variables,
        batches: Iterator[Dict[str, np.ndarray]],
        max_batches: Optional[int] = None,
        log_every: int = 50,
    ):
        """batches yield whitened images + padded GT (+ difficult flags).

        Returns (map07, map12, {class: ap07}, stats).
        """
        acc = StreamingTpFp(self.spec.num_classes)
        n_images = 0
        t_start = time.time()
        batch_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(self.mesh, P("data"))
            variables = jax.device_put(
                variables,
                jax.tree.map(lambda _: NamedSharding(self.mesh, P()), variables),
            )
        for bi, batch in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            image = batch["image"]
            gt_labels = batch["gt_labels"]
            gt_boxes = batch["gt_boxes"]
            gt_difficult = batch["gt_difficult"]
            if batch_sharding is not None:
                image = jax.device_put(image, batch_sharding)
                gt_labels = jax.device_put(jnp.asarray(gt_labels), batch_sharding)
                gt_boxes = jax.device_put(jnp.asarray(gt_boxes), batch_sharding)
                gt_difficult = jax.device_put(
                    jnp.asarray(gt_difficult), batch_sharding
                )
            scores, boxes = self.detector(variables, image)
            res = self._match(
                scores,
                boxes,
                gt_labels,
                gt_boxes,
                gt_difficult,
            )
            scores_np = np.asarray(scores)
            n_gt = np.asarray(res.n_gt)
            tp = np.asarray(res.tp)
            fp = np.asarray(res.fp)
            b = scores_np.shape[0]
            sample_valid = np.asarray(
                batch.get("sample_valid", np.ones((b,), bool))
            )
            for img in range(b):
                if not sample_valid[img]:
                    continue  # padding row of a final short batch
                for c in range(1, self.spec.num_classes):
                    acc.add(
                        c,
                        n_gt[img, c - 1],
                        scores_np[img, c - 1],
                        tp[img, c - 1],
                        fp[img, c - 1],
                    )
            n_images += int(sample_valid.sum())
            if log_every and (bi + 1) % log_every == 0:
                dt = time.time() - t_start
                print(f"[eval] {n_images} images, {dt / n_images:.3f} sec/image")

        map07, aps07 = acc.mean_average_precision("voc07")
        map12, _ = acc.mean_average_precision("voc12")
        stats = {
            "images": n_images,
            "sec_per_image": (time.time() - t_start) / max(n_images, 1),
        }
        return map07, map12, aps07, stats
