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
        loss_config=None,
        loss_match_threshold: float = 0.5,
        loss_ignore_threshold: float = 0.3,
    ):
        """mesh: optional jax.sharding.Mesh — shards every eval batch over
        the 'data' axis (multi-chip data-parallel inference; params are
        replicated). The reference ran eval strictly single-device
        (ref: eval_ron_network.py:137-366); batch_size must be divisible by
        the data-axis size.

        loss_config: optional RonLossConfig/SsdLossConfig — report the model
        losses on every eval batch alongside the detection metrics, like the
        reference's eval graph did (ref: eval_ron_network.py:212-220). The
        forward pass is shared with detection (one model.apply per batch)."""
        # Sharded eval keeps the Pallas NMS fast path: the Detector wraps the
        # kernel in shard_map over 'data' when given a mesh (Pallas custom
        # calls do not partition under plain GSPMD).
        self.detector = Detector(model, spec, config, mesh=mesh)
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
        self._loss_jit = None
        if loss_config is not None:
            from ..ops.encode import TargetEncoder
            from ..train.state import detection_loss_fn

            encoder = TargetEncoder(
                spec.anchor_layout(),
                spec.img_shape,
                loss_match_threshold,
                loss_ignore_threshold,
                spec.prior_scaling,
            )
            loss = detection_loss_fn(loss_config)

            def loss_step(out, gt_labels, gt_boxes, rng):
                targets = encoder.batched(gt_labels, gt_boxes, gt_labels > 0)
                _, metrics = loss(rng, out, targets)
                return {k: v for k, v in metrics.items() if k.startswith("loss/")}

            self._loss_jit = jax.jit(loss_step)
        from ..data.preprocess import whiten

        self._whiten_jit = jax.jit(
            lambda u8: whiten(u8.astype(jnp.float32) / 255.0)
        )

    def run(
        self,
        variables,
        batches: Iterator[Dict[str, np.ndarray]],
        max_batches: Optional[int] = None,
        log_every: int = 50,
        debug_dir: Optional[str] = None,
        debug_max_images: int = 64,
        debug_score_threshold: float = 0.5,
    ):
        """batches yield whitened images + padded GT (+ difficult flags).

        debug_dir: dump boxed JPEGs of the post-NMS detections for the first
        `debug_max_images` images, like the reference's in-graph py_func hook
        (ref: eval_ron_network.py:240-247 save_image_with_bbox).

        Returns (map07, map12, {class: ap07}, stats).
        """
        acc = StreamingTpFp(self.spec.num_classes)
        n_images = 0
        loss_sums: Dict[str, float] = {}
        n_loss_batches = 0
        t_start = time.time()
        batch_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(self.mesh, P("data"))
            variables = jax.device_put(
                variables,
                jax.tree.map(lambda _: NamedSharding(self.mesh, P()), variables),
            )
        else:
            # Checkpoints restore as host numpy; without this one-time
            # placement every jitted call re-uploads the full param tree
            # (~100s of MB — hundreds of ms per batch on a PCIe/tunnel link).
            variables = jax.device_put(variables)
        n_debugged = 0

        def debug_dump(image_np, scores_np, boxes_np):
            """Boxed-JPEG dump of one batch's detections (host side)."""
            nonlocal n_debugged
            from ..data.preprocess import VGG_MEANS
            from ..utils.visualization import save_image_with_boxes

            for img in range(image_np.shape[0]):
                if n_debugged >= debug_max_images:
                    return
                if image_np.dtype == np.uint8:
                    img01 = image_np[img].astype(np.float32) / 255.0
                else:  # whitened floats -> [0,1]
                    img01 = (
                        image_np[img].astype(np.float32)
                        + np.asarray(VGG_MEANS, np.float32)
                    ) / 255.0
                keep = scores_np[img] >= debug_score_threshold  # [C-1, K]
                cls_idx, det_idx = np.nonzero(keep)
                save_image_with_boxes(
                    img01,
                    boxes_np[img][cls_idx, det_idx],
                    cls_idx + 1,  # class axis is background-stripped
                    scores_np[img][cls_idx, det_idx],
                    directory=debug_dir,
                    index=n_debugged,
                )
                n_debugged += 1

        def dispatch(bi, batch):
            """Enqueue one batch on the device; returns lazy device arrays.
            JAX dispatch is async — the device starts on this batch while
            the host harvests the previous one below."""
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
            if image.dtype == np.uint8:
                # uint8 transport: callers may ship raw 0..255 pixels (4x
                # less host->device traffic); scale + VGG-whiten on device
                # (sharding, if any, is preserved — elementwise op).
                image = self._whiten_jit(image)
            if self._loss_jit is not None:
                # Shared forward: one model.apply feeds both the detection
                # postprocess and the loss (ref: eval_ron_network.py:208-236
                # computed both in one graph).
                out = self.detector._apply_jit(variables, image)
                scores, boxes = self.detector._post_jit(out)
                batch_losses = self._loss_jit(
                    out,
                    jnp.asarray(gt_labels),
                    jnp.asarray(gt_boxes),
                    jax.random.PRNGKey(bi),
                )
            else:
                batch_losses = None
                scores, boxes = self.detector(variables, image)
            res = self._match(
                scores,
                boxes,
                gt_labels,
                gt_boxes,
                gt_difficult,
            )
            sample_valid = batch.get("sample_valid")
            debug_image = None
            if debug_dir is not None and n_debugged < debug_max_images:
                debug_image = np.asarray(batch["image"])
            return bi, scores, boxes, res, batch_losses, sample_valid, debug_image

        def harvest(pending):
            """Pull one dispatched batch to host and accumulate TP/FP.
            Runs while the NEXT batch computes on device (the reference's
            eval loop was strictly serial per sess.run,
            ref: eval_ron_network.py:354-366)."""
            nonlocal n_images, n_loss_batches
            bi, scores, boxes, res, batch_losses, sample_valid, debug_image = pending
            scores_np = np.asarray(scores)
            if debug_image is not None:
                debug_dump(debug_image, scores_np, np.asarray(boxes))
            n_gt = np.asarray(res.n_gt)
            tp = np.asarray(res.tp)
            fp = np.asarray(res.fp)
            b = scores_np.shape[0]
            if sample_valid is None:
                sample_valid = np.ones((b,), bool)
            sample_valid = np.asarray(sample_valid)
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
            if batch_losses is not None:
                # batch-mean losses (padding rows of a final short batch
                # contribute empty GT — negligible over a full epoch)
                for k, v in batch_losses.items():
                    loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
                n_loss_batches += 1
            if log_every and (bi + 1) % log_every == 0:
                dt = time.time() - t_start
                print(f"[eval] {n_images} images, {dt / n_images:.3f} sec/image")

        # One-deep software pipeline: dispatch batch i, then harvest batch
        # i-1 — device compute overlaps host-side result transfer and
        # python accumulation.
        pending = None
        for bi, batch in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            current = dispatch(bi, batch)
            if pending is not None:
                harvest(pending)
            pending = current
        if pending is not None:
            harvest(pending)

        map07, aps07 = acc.mean_average_precision("voc07")
        map12, _ = acc.mean_average_precision("voc12")
        stats = {
            "images": n_images,
            "sec_per_image": (time.time() - t_start) / max(n_images, 1),
        }
        for k, v in loss_sums.items():
            stats[k] = v / max(n_loss_batches, 1)
        return map07, map12, aps07, stats
