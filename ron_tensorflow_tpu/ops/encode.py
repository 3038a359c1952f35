"""Ground-truth encoding: joint all-layer dual-max anchor matching.

TPU-native re-design of the reference's "big fix" encoder
(ref: nets/ssd_common.py:27-147 `iou_matrix`/`do_dual_max_match`/
`tf_ssd_bboxes_encode_layer` and :337-414 `tf_ssd_bboxes_encode`,
README.md:24-27): anchors of *all* feature layers are matched jointly in one
dense pass. The reference's dynamic `[num_gt, num_anchors]` matrices become
static `[max_gt, num_anchors]` with a validity mask, so the whole encoder is
one fused XLA program, vmappable over the batch and runnable on device inside
the input pipeline or the train step.

Match-state conventions (identical to the reference):
  label > 0   positive anchor (matched gt's class)
  label == 0  negative (best IoU < ignore_threshold)
  label == -1 ignore (IoU in [ignore_threshold, positive_threshold))
and a gt→anchor argmax override forcibly claims the best anchor per gt
regardless of thresholds (ref: nets/ssd_common.py:66-75).

Localization targets (ref: nets/ssd_common.py:129-147), note SSD (cx, cy, w, h)
output order:
  t = ((gcx-acx)/aw/s0, (gcy-acy)/ah/s1, log(gw/aw)/s2, log(gh/ah)/s3)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchors import AnchorLayout
from .boxes import iou_matrix


class EncodedTargets(NamedTuple):
    """Per-anchor training targets, flat across all feature layers."""

    labels: jnp.ndarray  # [N] int32: class id, 0 = negative, -1 = ignore
    locations: jnp.ndarray  # [N, 4] float32 regression targets (cx, cy, w, h) order
    scores: jnp.ndarray  # [N] float32 matched IoU (post gt-override selection)


def anchor_inside_mask(layout: AnchorLayout, img_shape: Tuple[int, int]) -> np.ndarray:
    """Static per-anchor mask of anchors within `allowed_border` of the image
    (ref: nets/ssd_common.py:112-115). Computed once per layout — a constant
    folded into the compiled encoder.
    """
    c = layout.corners
    b = layout.allowed_borders
    h, w = float(img_shape[0]), float(img_shape[1])
    return (
        (c[:, 0] >= -b / h)
        & (c[:, 1] >= -b / w)
        & (c[:, 2] < (h + b) / h)
        & (c[:, 3] < (w + b) / w)
    )


def dual_max_match(
    overlap: jnp.ndarray,
    gt_valid: jnp.ndarray,
    positive_threshold: float,
    ignore_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized dual-max matching (ref: nets/ssd_common.py:47-75).

    Args:
      overlap: [G, N] IoU matrix (already border-masked); padded gt rows must
        be all-zero.
      gt_valid: [G] bool mask of real (non-padding) gt rows.
      positive_threshold / ignore_threshold: high/low IoU thresholds.

    Returns:
      match_idx: [N] int32 — matched gt index, -1 negative, -2 ignore.
      match_scores: [N] float — IoU with the selected gt (gt-override aware).
    """
    # Anchor → gt pass.
    anchors_to_gt = jnp.argmax(overlap, axis=0).astype(jnp.int32)  # [N]
    match_values = jnp.max(overlap, axis=0)  # [N]

    negative = match_values < ignore_threshold
    ignore = (match_values >= ignore_threshold) & (match_values < positive_threshold)
    match_idx = jnp.where(negative, -1, anchors_to_gt)
    match_idx = jnp.where(ignore, -2, match_idx)

    # Gt → anchor override: each (valid) gt forcibly claims its best anchor.
    gt_to_anchors = jnp.argmax(overlap, axis=1).astype(jnp.int32)  # [G]
    claim = jax.nn.one_hot(gt_to_anchors, overlap.shape[1], dtype=jnp.int32)  # [G, N]
    claim = claim * gt_valid.astype(jnp.int32)[:, None]
    claimed = jnp.max(claim, axis=0) > 0  # [N]
    # Ties resolve to the lowest gt index, like tf.argmax over the one-hot.
    claiming_gt = jnp.argmax(claim, axis=0).astype(jnp.int32)  # [N]

    match_idx = jnp.where(claimed, claiming_gt, match_idx)
    score_gt = jnp.where(claimed, claiming_gt, anchors_to_gt)
    # Row selection as a [G, N] mask contraction instead of a gather — TPU
    # gathers with per-anchor indices lower poorly (measured ~5x encoder
    # slowdown in the train step); G is tiny so the dense mask is free.
    sel = (jnp.arange(overlap.shape[0], dtype=jnp.int32)[:, None] == score_gt[None, :])
    match_scores = jnp.sum(overlap * sel.astype(overlap.dtype), axis=0)
    return match_idx, match_scores


@partial(jax.jit, static_argnames=("positive_threshold", "ignore_threshold", "prior_scaling", "img_shape"))
def _encode_flat(
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors_cyxhw: jnp.ndarray,
    anchors_corner: jnp.ndarray,
    inside_mask: jnp.ndarray,
    positive_threshold: float,
    ignore_threshold: float,
    prior_scaling: Tuple[float, float, float, float],
    img_shape: Tuple[int, int],
) -> EncodedTargets:
    del img_shape  # border filtering is baked into inside_mask
    overlap = iou_matrix(gt_boxes, anchors_corner)  # [G, N]
    overlap = overlap * inside_mask.astype(overlap.dtype)[None, :]
    overlap = overlap * gt_valid.astype(overlap.dtype)[:, None]

    match_idx, match_scores = dual_max_match(
        overlap, gt_valid, positive_threshold, ignore_threshold
    )

    matched = match_idx > -1
    # Gather-free row selection (see dual_max_match): a [G, N] one-hot mask
    # contracts the tiny gt tables onto the anchor axis. Unmatched anchors
    # select an arbitrary row — their labels/locations are masked out below.
    safe_idx = jnp.clip(match_idx, 0, None)
    sel = (
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)[:, None] == safe_idx[None, :]
    ).astype(gt_boxes.dtype)  # [G, N]
    feat_labels = jnp.sum(
        gt_labels.astype(jnp.int32)[:, None] * sel.astype(jnp.int32), axis=0
    )
    # label: class for matched, 0 for negative, -1 for ignore
    labels = feat_labels * matched.astype(feat_labels.dtype) + (
        -1 * (match_idx < -1).astype(feat_labels.dtype)
    )

    # exact select (NOT einsum: MXU matmul default precision would round
    # the coordinates through bf16)
    g = jnp.sum(gt_boxes[:, None, :] * sel[:, :, None], axis=0)  # [N, 4] corner
    gcy = (g[:, 0] + g[:, 2]) / 2.0
    gcx = (g[:, 1] + g[:, 3]) / 2.0
    gh = g[:, 2] - g[:, 0]
    gw = g[:, 3] - g[:, 1]

    acy, acx, ah, aw = (
        anchors_cyxhw[:, 0],
        anchors_cyxhw[:, 1],
        anchors_cyxhw[:, 2],
        anchors_cyxhw[:, 3],
    )
    s0, s1, s2, s3 = prior_scaling
    # Guard log/div for unmatched (zeroed) rows; outputs there are masked to 0.
    gh_safe = jnp.where(matched, gh, ah)
    gw_safe = jnp.where(matched, gw, aw)
    # Index convention: channel 0 (cx) uses s0 and channel 1 (cy) uses s1 on
    # BOTH encode and decode sides. (The reference swaps them between
    # tf_ssd_bboxes_encode_layer and decode — latent bug masked by its
    # s0 == s1 defaults, ref: nets/ssd_common.py:141-144 vs :448-470; here
    # encode/decode are exact mutual inverses for any scaling.)
    tcy = (gcy - acy) / ah / s1
    tcx = (gcx - acx) / aw / s0
    th = jnp.log(gh_safe / ah) / s3
    tw = jnp.log(gw_safe / aw) / s2
    locations = jnp.stack([tcx, tcy, tw, th], axis=-1)  # SSD (cx, cy, w, h) order
    locations = locations * matched.astype(locations.dtype)[:, None]

    return EncodedTargets(
        labels=labels.astype(jnp.int32), locations=locations, scores=match_scores
    )


class TargetEncoder:
    """Callable encoder bound to an anchor layout.

    Replaces the per-call anchor concat + matching of the reference's
    `tf_ssd_bboxes_encode` (ref: nets/ssd_common.py:337-414) with a
    precomputed layout and one fused jitted function. Use `.batched()` for a
    vmapped [B, ...] version.
    """

    def __init__(
        self,
        layout: AnchorLayout,
        img_shape: Tuple[int, int],
        positive_threshold: float = 0.5,
        ignore_threshold: float = 0.3,
        prior_scaling: Sequence[float] = (0.1, 0.1, 0.2, 0.2),
    ):
        self.layout = layout
        self.img_shape = tuple(img_shape)
        self.positive_threshold = float(positive_threshold)
        self.ignore_threshold = float(ignore_threshold)
        self.prior_scaling = tuple(float(s) for s in prior_scaling)
        self._cyxhw = jnp.asarray(layout.cyxhw)
        self._corners = jnp.asarray(layout.corners)
        self._inside = jnp.asarray(anchor_inside_mask(layout, self.img_shape))

    def __call__(self, gt_labels, gt_boxes, gt_valid) -> EncodedTargets:
        """Encode one image.

        Args:
          gt_labels: [G] int — class ids (padded entries arbitrary).
          gt_boxes: [G, 4] float corner boxes (padded entries must be zeros).
          gt_valid: [G] bool — validity of each gt row.
        """
        return _encode_flat(
            gt_labels,
            gt_boxes,
            gt_valid,
            self._cyxhw,
            self._corners,
            self._inside,
            self.positive_threshold,
            self.ignore_threshold,
            self.prior_scaling,
            self.img_shape,
        )

    def batched(self, gt_labels, gt_boxes, gt_valid) -> EncodedTargets:
        """Encode a batch: [B, G], [B, G, 4], [B, G] -> batched targets."""
        return jax.vmap(self.__call__)(gt_labels, gt_boxes, gt_valid)
