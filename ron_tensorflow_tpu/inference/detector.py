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
from ..ops import math as mathops
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
    # TPU speed knobs (exact reference semantics when False/'loop'/0):
    # approx_top_k uses lax.approx_max_k for candidate selection (~2x faster
    # postproc, >=95% candidate recall). Default OFF: the crowded-scale A/B
    # (NOTES.md round 5) measured it NOT mAP-lossless on dense scenes
    # (mAP07 0.6775 vs 0.6756 exact on the crowded rehearsal — sparse
    # scenes measured identical), so exact selection is the default and
    # approx is an opt-in speed lever. All NMS methods produce the SAME
    # keep set for the same candidates (unit-tested, and the crowded A/B
    # measured loop/fixpoint/pallas mAP-identical to 10 digits): 'loop' =
    # sequential greedy scan, 'fixpoint' = XLA suppression fixpoint,
    # 'pallas' = VMEM-resident batched fixpoint kernel (fastest on TPU,
    # ~1.1 ms faster e2e at batch 32), 'auto' = pallas on accelerators /
    # loop on CPU.
    approx_top_k: bool = False
    # Exact top-k via per-chunk partial top-k + final top-k over the
    # candidate pool (ops/math.py::exact_top_k_chunked) — BIT-IDENTICAL to
    # lax.top_k incl. tie order (tested on-chip), unlike approx_top_k.
    # Default 16: measured +12% e2e at batch 32 over plain lax.top_k
    # (626.6 -> 700.0 img/s, tools/perf_topk.py) with zero semantic change,
    # so the exact reference semantics stay the default AND keep most of
    # the approx path's speed. 0/1 = plain lax.top_k. Applies to the
    # per-class selection stage (and the shared preselection stage when
    # enabled); ignored when approx_top_k is set.
    topk_chunks: int = 16
    nms_method: str = "auto"  # 'auto' | 'loop' | 'fixpoint' | 'pallas'
    # Run model.apply and postprocess as two XLA programs instead of one
    # fused program. Workaround for a libtpu crash ("TPU worker process
    # crashed", kernel fault) observed ONLY for SSD-300/512 in float32 when
    # forward+postprocess compile together; bf16 inference (the default
    # everywhere) and RON are unaffected. Costs ~1 dispatch (~1.5 ms).
    split_apply: bool = False
    # Whole-image candidate preselection: one top-K over the per-anchor max
    # class score; all classes then select among those K candidates instead
    # of scanning all N anchors per class (~6x less top-k/gather work at
    # N=21250, K=1000). 0 = off (per-class selection over all anchors, the
    # reference's semantics — and the library default). A candidate outside
    # the shared top-K is dropped for EVERY class, which can lose detections
    # on crowded scenes: the sparse-scene A/B measured K=1000 lossless, but
    # the crowded-rehearsal A/B measured -0.0005 mAP07 (NOTES.md round 5),
    # so eval presets keep it OFF and it remains an opt-in serving knob.
    # Nonzero K also disables approx_top_k in the second (per-class) stage.
    shared_top_k: int = 0


@dataclasses.dataclass(frozen=True)
class RealtimeConfig:
    """Realtime-eval defaults — the reference's published flag values
    (ref: ron_eval.py:83-91 select 0.6 / nms 0.4 / objectness 0.95 /
    nms_topk 20)."""

    select_threshold: float = 0.6
    objectness_threshold: float = 0.95
    # static-shape cap on the sort stage (the reference sorts every gated
    # candidate; the 0.95 objectness gate keeps far fewer than 400)
    top_k: int = 400
    keep_top_k: int = 20
    nms_threshold: float = 0.4
    nms_mode: str = "union"
    # min-size ratio RELATIVE TO THE NET INPUT; at detection time it is
    # scaled by sqrt(H0*W0/(320*320)) of the original frame
    # (ref: ron_eval.py:369-375 filter_boxes)
    min_size: float = 0.03
    # Class-wise mode: per-class top-k + per-class NMS (the streaming
    # `detected_bboxes` semantics) instead of the RON-specific
    # argmax-class flatten + whole-image class-blind NMS of ron_eval.py.
    # ron_eval.py's whole-image path only makes sense behind a sharp
    # objectness gate; for detectors WITHOUT an objectness branch (SSD)
    # the class-blind union NMS suppresses across classes and costs real
    # mAP (measured: 0.886 streaming vs 0.805 whole-image on a trained
    # SSD-512). `for_spec` selects this automatically for such models.
    class_wise: bool = False
    keep_per_class: int = 100  # per-class NMS survivors before the flatten

    @classmethod
    def for_spec(cls, spec, **overrides):
        """Model-family-appropriate realtime defaults: the published
        ron_eval.py flags for objectness models, streaming-equivalent
        class-wise settings (eval_ssd_network.py's select/top-k/NMS
        values) for detectors without an objectness prior."""
        if getattr(spec, "has_objectness", True):
            return dataclasses.replace(cls(), **overrides)
        base = cls(
            class_wise=True,
            select_threshold=0.01,
            objectness_threshold=0.0,
            top_k=200,
            keep_per_class=100,
            keep_top_k=200,
            nms_mode="min",
        )
        overrides.pop("objectness_threshold", None)  # objness==1 for these
        return dataclasses.replace(base, **overrides)


class Detector:
    """Class-wise detection head over a trained model."""

    def __init__(
        self,
        model,
        spec: DetectorSpec,
        config: DetectionConfig = DetectionConfig(),
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with a 'data' axis. Pallas custom
        calls do not partition under GSPMD, so with a mesh the Pallas NMS is
        wrapped in `jax.shard_map` over 'data' — each device runs the kernel
        on its local batch shard and sharded eval keeps the single-chip fast
        path (previously sharded eval silently fell back to the XLA
        fixpoint). Batch size must be divisible by the data-axis size."""
        self.model = model
        self.spec = spec
        self.config = config
        self.mesh = mesh
        self._anchors = jnp.asarray(spec.anchor_layout().cyxhw)

    def __call__(self, variables, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images [B, H, W, 3] (whitened) ->
        (scores [B, C-1, keep_top_k], boxes [B, C-1, keep_top_k, 4])."""
        if self.config.split_apply:
            out = self._apply_jit(variables, images)
            return self._post_jit(out)
        return self._fused_jit(variables, images)

    @partial(jax.jit, static_argnums=(0,))
    def _fused_jit(self, variables, images):
        out = self.model.apply(variables, images, train=False)
        return self.postprocess(out)

    @partial(jax.jit, static_argnums=(0,))
    def _apply_jit(self, variables, images):
        return self.model.apply(variables, images, train=False)

    @partial(jax.jit, static_argnums=(0,))
    def _post_jit(self, out):
        return self.postprocess(out)

    def postprocess(self, out):
        cfg = self.config
        decoded = decode_boxes(out.locations, self._anchors, self.spec.prior_scaling)
        decoded = boxops.clip_to_ref(decoded)  # [B, N, 4], shared by all classes

        # Binary objectness gate on class probabilities
        # (ref: eval_ron_network.py:228-229).
        gate = out.objness_pred > cfg.objectness_threshold  # [B, N]
        size_ok = boxops.min_size_mask(decoded, cfg.min_size)  # [B, N]
        base = gate & size_ok

        cls = out.predictions[..., 1:]  # [B, N, C-1]
        scores = jnp.moveaxis(cls, -1, -2)  # [B, C-1, N]
        if cfg.shared_top_k and cfg.shared_top_k < cls.shape[1]:
            # Whole-image preselection: one top-K over per-anchor max class
            # score; per-class work then runs on [K], not [N]. All gathers
            # use trailing-axis take_along_axis with broadcast indices — the
            # same lowering as the per-class top-k path below (leading-axis
            # gathers here triggered a libtpu runtime fault on SSD shapes).
            m = jnp.where(base, jnp.max(cls, axis=-1), 0.0)  # [B, N]
            kk = cfg.shared_top_k
            if cfg.approx_top_k:
                _, cand = jax.lax.approx_max_k(m, kk)  # [B, K]
            else:
                _, cand = mathops.exact_top_k_chunked(m, kk, cfg.topk_chunks)
            scores = jnp.take_along_axis(
                scores, cand[:, None, :], axis=2
            )  # [B, C-1, K]
            decoded = jnp.take_along_axis(
                decoded[:, None, :, :], cand[:, None, :, None], axis=2
            )[:, 0]  # [B, K, 4]
            base = jnp.take_along_axis(base[:, None, :], cand[:, None, :], axis=2)[
                :, 0
            ]  # [B, K]

        # Per-class scores [B, C-1, K]; masked entries zeroed. Boxes are NOT
        # materialized per class — they're gathered after top-k, avoiding the
        # reference's per-class box dict (a [B, C, N, 4] tensor at scale).
        keep = base[:, None, :] & (scores > cfg.select_threshold)
        scores = jnp.where(keep, scores, 0.0)

        k = min(cfg.top_k, scores.shape[-1])
        if cfg.approx_top_k and k < scores.shape[-1] and not cfg.shared_top_k:
            top_scores, top_idx = jax.lax.approx_max_k(scores, k)
        else:
            top_scores, top_idx = mathops.exact_top_k_chunked(
                scores, k, cfg.topk_chunks
            )  # [B, C-1, k]
        top_boxes = jnp.take_along_axis(
            decoded[:, None, :, :], top_idx[..., None], axis=2
        )  # [B, C-1, k, 4]
        if k < cfg.top_k:
            pad = cfg.top_k - k
            top_scores = jnp.pad(top_scores, ((0, 0), (0, 0), (0, pad)))
            top_boxes = jnp.pad(top_boxes, ((0, 0), (0, 0), (0, pad), (0, 0)))

        # NMS method/interpret dispatch. NEVER read the ambient default
        # platform (jax.devices()[0]) here: it can be a tunneled TPU while
        # the computation is placed on a CPU mesh (the MULTICHIP_r04
        # regression). With a mesh, the target devices are statically known;
        # without one, 'auto'/'pallas' defer the choice to XLA lowering time
        # via lax.platform_dependent, which follows the actual placement.
        method = cfg.nms_method
        b, c = top_scores.shape[:2]
        flat_s = top_scores.reshape(b * c, -1)
        flat_b = top_boxes.reshape(b * c, -1, 4)

        from ..kernels import nms_sorted_pallas

        def pallas_rows(interpret):
            return lambda s2, b2: nms_sorted_pallas(
                s2, b2, cfg.nms_threshold, cfg.keep_top_k, cfg.nms_mode,
                interpret=interpret,
            )

        def xla_rows(core):
            nms_fn = lambda s2, b2: core(
                s2, b2, cfg.nms_threshold, cfg.keep_top_k, cfg.nms_mode
            )
            return jax.vmap(nms_fn)

        if self.mesh is not None:
            platform = next(iter(self.mesh.devices.flat)).platform
            if method == "auto":
                method = "loop" if platform == "cpu" else "pallas"
            if method == "pallas":
                # Manual-sharding island: each device NMSes its local rows.
                # The [B*C, ...] reshape is b-major, so a 'data' split of
                # axis 0 keeps whole images on one device (C rows apiece).
                from jax.sharding import PartitionSpec as P

                run = jax.shard_map(
                    pallas_rows(platform == "cpu"),
                    mesh=self.mesh,
                    in_specs=(P("data"), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
                s, bx = run(flat_s, flat_b)
                return s.reshape(b, c, -1), bx.reshape(b, c, -1, 4)
        elif method == "auto":
            # Lowering-time choice: greedy sequential loop on CPU (faster
            # than interpret-mode Pallas), the VMEM fixpoint kernel on
            # accelerators.
            s, bx = jax.lax.platform_dependent(
                flat_s, flat_b,
                cpu=xla_rows(nmsops.nms_sorted),
                default=pallas_rows(False),
            )
            return s.reshape(b, c, -1), bx.reshape(b, c, -1, 4)
        elif method == "pallas":
            s, bx = pallas_rows("auto")(flat_s, flat_b)
            return s.reshape(b, c, -1), bx.reshape(b, c, -1, 4)
        nms_core = (
            nmsops.nms_sorted_fixpoint if method == "fixpoint" else nmsops.nms_sorted
        )
        s, bx = xla_rows(nms_core)(flat_s, flat_b)
        return s.reshape(b, c, -1), bx.reshape(b, c, -1, 4)


class RealtimeDetector:
    """Whole-image NMS detection head (the 0.7+ mAP path)."""

    def __init__(self, model, spec: DetectorSpec, config: RealtimeConfig = RealtimeConfig()):
        self.model = model
        self.spec = spec
        self.config = config
        self._anchors = jnp.asarray(spec.anchor_layout().cyxhw)

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, variables, images, min_size=None):
        """-> (scores, labels, boxes, valid) each [B, keep_top_k(,4)].

        min_size: optional scalar or per-image [B] vector overriding
        config.min_size — the caller passes
        `config.min_size * sqrt(H0*W0 / (Hnet*Wnet))` so the filter matches
        the reference's original-frame scaling (ref: ron_eval.py:369-375);
        batched callers mix frames of different original sizes in one
        dispatch."""
        out = self.model.apply(variables, images, train=False)
        return self.postprocess(out, min_size=min_size)

    def postprocess(self, out, min_size=None):
        cfg = self.config
        if min_size is None:
            min_size = cfg.min_size
        min_size = jnp.maximum(jnp.asarray(min_size, jnp.float32), 1e-4)
        min_size = jnp.broadcast_to(min_size, out.predictions.shape[:1])  # [B]
        decoded = decode_boxes(out.locations, self._anchors, self.spec.prior_scaling)
        if cfg.class_wise:
            return self._postprocess_class_wise(out, decoded, min_size)

        def per_image(preds, objness, dec, min_size):
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
            valid &= boxops.min_size_mask(b, min_size)
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

        return jax.vmap(per_image)(
            out.predictions, out.objness_pred, decoded, min_size
        )

    def _postprocess_class_wise(self, out, decoded, min_size):
        """Streaming-semantics realtime path: per-class top-k + per-class
        NMS (exactly `Detector.postprocess`'s candidate selection), then one
        whole-image flatten to (scores, labels, boxes, valid). Used for
        detectors without an objectness branch, where ron_eval.py's
        class-blind whole-image NMS has no reference analogue and measurably
        hurts (see RealtimeConfig.class_wise)."""
        cfg = self.config
        num_classes = out.predictions.shape[-1]

        def per_image(preds, objness, dec, ms):
            b = boxops.clip_to_ref(dec)  # [N, 4]
            base = (objness > cfg.objectness_threshold) & boxops.min_size_mask(
                b, ms
            )
            cls = preds[:, 1:]  # [N, C-1]
            keep = base[:, None] & (cls > cfg.select_threshold)
            scores = jnp.where(keep, cls, 0.0).T  # [C-1, N]
            k = min(cfg.top_k, scores.shape[-1])
            # chunked exact top-k: bit-identical to lax.top_k, ~18% faster
            # on the full-anchor scan (ops/math.py, tools/perf_topk.py)
            top_scores, top_idx = mathops.exact_top_k_chunked(scores, k, 16)
            # trailing-axis gather — same lowering as Detector.postprocess
            # (leading-axis gathers fault in libtpu on SSD shapes)
            top_boxes = jnp.take_along_axis(
                b[None, :, :], top_idx[..., None], axis=1
            )  # [C-1, k, 4]
            # Both variants are pure XLA with the same keep set; the pick is
            # perf-only (loop wins on CPU, fixpoint on TPU) and is made at
            # lowering time so it follows the computation's actual platform,
            # not the ambient default device.
            def run_nms(core):
                per_class = lambda ss, bb: core(
                    ss, bb, cfg.nms_threshold, cfg.keep_per_class, cfg.nms_mode
                )
                return jax.vmap(per_class)

            s, bx = jax.lax.platform_dependent(
                top_scores,
                top_boxes,
                cpu=run_nms(nmsops.nms_sorted),
                default=run_nms(nmsops.nms_sorted_fixpoint),
            )  # [C-1, keep_per_class]
            labels = jnp.broadcast_to(
                jnp.arange(1, num_classes, dtype=jnp.int32)[:, None], s.shape
            )
            flat_s = s.reshape(-1)
            flat_b = bx.reshape(-1, 4)
            flat_l = labels.reshape(-1)
            kk = min(cfg.keep_top_k, flat_s.shape[0])
            vals, idx = jax.lax.top_k(flat_s, kk)
            lab = jnp.take_along_axis(flat_l, idx, axis=0)
            bxs = jnp.take_along_axis(flat_b, idx[:, None], axis=0)
            return vals, lab, bxs, vals > 0

        return jax.vmap(per_image)(
            out.predictions, out.objness_pred, decoded, min_size
        )
