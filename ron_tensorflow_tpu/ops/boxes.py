"""Core box geometry — pure, shape-static jnp functions.

TPU-native replacement for the reference's `tf_extended/bboxes.py`
(reference: tf_extended/bboxes.py:103-566) and `nets/ssd_common.py:25-46`.
All boxes use normalized corner coordinates `(ymin, xmin, ymax, xmax)` in
`[..., 4]` arrays unless noted. Everything here is differentiable,
vmappable, and free of data-dependent shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def areas(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas. boxes: [..., 4] -> [...]. (ref: nets/ssd_common.py:25-27)."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    return h * w


def intersection(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas.

    boxes_a: [A, 4], boxes_b: [B, 4] -> [A, B].
    (ref: nets/ssd_common.py:28-39, transposed-broadcast formulation.)
    """
    ymin = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    xmin = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    ymax = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    xmax = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    h = jnp.maximum(ymax - ymin, 0.0)
    w = jnp.maximum(xmax - xmin, 0.0)
    return h * w


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (Jaccard). [A, 4] x [B, 4] -> [A, B].

    Zero where the union is empty, matching the reference's guarded divide
    (ref: nets/ssd_common.py:40-46).
    """
    inter = intersection(boxes_a, boxes_b)
    union = areas(boxes_a)[:, None] + areas(boxes_b)[None, :] - inter
    return jnp.where(union == 0.0, 0.0, inter / jnp.where(union == 0.0, 1.0, union))


def jaccard_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one box [4] against many [N, 4] -> [N].

    (ref: tf_extended/bboxes.py:511-533 `bboxes_jaccard`.)
    """
    ymin = jnp.maximum(boxes[..., 0], box[0])
    xmin = jnp.maximum(boxes[..., 1], box[1])
    ymax = jnp.minimum(boxes[..., 2], box[2])
    xmax = jnp.minimum(boxes[..., 3], box[3])
    h = jnp.maximum(ymax - ymin, 0.0)
    w = jnp.maximum(xmax - xmin, 0.0)
    inter = h * w
    union = areas(boxes) + areas(box) - inter
    return jnp.where(union == 0.0, 0.0, inter / jnp.where(union == 0.0, 1.0, union))


def intersection_with_ref(ref_box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Fraction of each box's own area inside `ref_box`: [N, 4] -> [N].

    (ref: tf_extended/bboxes.py:536-566 `bboxes_intersection`.)
    """
    ymin = jnp.maximum(boxes[..., 0], ref_box[0])
    xmin = jnp.maximum(boxes[..., 1], ref_box[1])
    ymax = jnp.minimum(boxes[..., 2], ref_box[2])
    xmax = jnp.minimum(boxes[..., 3], ref_box[3])
    h = jnp.maximum(ymax - ymin, 0.0)
    w = jnp.maximum(xmax - xmin, 0.0)
    inter = h * w
    vol = areas(boxes)
    return jnp.where(vol == 0.0, 0.0, inter / jnp.where(vol == 0.0, 1.0, vol))


def clip_to_ref(boxes: jnp.ndarray, ref_box=None) -> jnp.ndarray:
    """Clip boxes to a reference box (default unit box), collapsing
    non-intersecting boxes to empty ones exactly like the reference
    (ref: tf_extended/bboxes.py:124-144 `bboxes_clip`).
    """
    if ref_box is None:
        ref_box = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=boxes.dtype)
    ymin = jnp.maximum(boxes[..., 0], ref_box[..., 0])
    xmin = jnp.maximum(boxes[..., 1], ref_box[..., 1])
    ymax = jnp.minimum(boxes[..., 2], ref_box[..., 2])
    xmax = jnp.minimum(boxes[..., 3], ref_box[..., 3])
    ymin = jnp.minimum(ymin, ymax)
    xmin = jnp.minimum(xmin, xmax)
    return jnp.stack([ymin, xmin, ymax, xmax], axis=-1)


def resize_to_ref(ref_box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Re-express boxes in the frame of `ref_box` (which maps to [0,0,1,1]).

    Used after cropping an image. (ref: tf_extended/bboxes.py:147-171
    `bboxes_resize`.)
    """
    v = jnp.stack([ref_box[0], ref_box[1], ref_box[0], ref_box[1]])
    s = jnp.stack(
        [
            ref_box[2] - ref_box[0],
            ref_box[3] - ref_box[1],
            ref_box[2] - ref_box[0],
            ref_box[3] - ref_box[1],
        ]
    )
    return (boxes - v) / s


def flip_left_right(boxes: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of normalized boxes.

    (ref: preprocessing/tf_image.py:284-308 box remap inside
    `random_flip_left_right`.)
    """
    return jnp.stack(
        [boxes[..., 0], 1.0 - boxes[..., 3], boxes[..., 2], 1.0 - boxes[..., 1]],
        axis=-1,
    )


def center_to_corner(cyxhw: jnp.ndarray) -> jnp.ndarray:
    """(cy, cx, h, w) -> (ymin, xmin, ymax, xmax)."""
    cy, cx, h, w = jnp.split(cyxhw, 4, axis=-1)
    return jnp.concatenate(
        [cy - h / 2.0, cx - w / 2.0, cy + h / 2.0, cx + w / 2.0], axis=-1
    )


def corner_to_center(corner: jnp.ndarray) -> jnp.ndarray:
    """(ymin, xmin, ymax, xmax) -> (cy, cx, h, w)."""
    ymin, xmin, ymax, xmax = jnp.split(corner, 4, axis=-1)
    return jnp.concatenate(
        [(ymin + ymax) / 2.0, (xmin + xmax) / 2.0, ymax - ymin, xmax - xmin], axis=-1
    )


def filter_center_mask(boxes: jnp.ndarray, margins=(0.0, 0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Mask of boxes whose center lies inside [0,0,1,1]+margins.

    Faithfully reproduces the reference — including its quirk of testing `cx`
    twice and never `cy` against the upper bound
    (ref: tf_extended/bboxes.py:458-475 `bboxes_filter_center`).
    """
    cy = (boxes[..., 0] + boxes[..., 2]) / 2.0
    cx = (boxes[..., 1] + boxes[..., 3]) / 2.0
    mask = cy > margins[0]
    mask &= cx > margins[1]
    mask &= cx < 1.0 + margins[2]
    mask &= cx < 1.0 + margins[3]
    return mask


def filter_overlap_mask(boxes: jnp.ndarray, valid: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Mask of boxes overlapping [0,0,1,1] by more than `threshold` —
    always keeping at least the best-overlapping valid box
    (ref: tf_extended/bboxes.py:478-503 `bboxes_filter_overlap`).

    `valid` masks padded GT entries out of the always-keep-one rule.
    """
    ref = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=boxes.dtype)
    scores = intersection_with_ref(ref, boxes)
    scores = jnp.where(valid, scores, -1.0)
    max_score = jnp.max(scores)
    keep = (scores > threshold) | (scores == max_score)
    return keep & valid


def min_size_mask(boxes: jnp.ndarray, min_size: float = 0.03) -> jnp.ndarray:
    """Mask of boxes with height AND width > min_size.

    (ref: nets/ron_vgg_320.py:196-233 `bboxes_filter_min`,
    ron_eval.py:369-392 `filter_boxes` size part.)
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    return (w > min_size) & (h > min_size)
