"""Box decoding — the inverse of the target transform.

TPU-native version of the reference's per-layer decode
(ref: nets/ssd_common.py:452-500 `tf_ssd_bboxes_decode_layer` /
`tf_ssd_bboxes_decode`), operating on the flat all-layer anchor layout.
Localization predictions use SSD (cx, cy, w, h) channel order.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def decode_boxes(
    locations: jnp.ndarray,
    anchors_cyxhw: jnp.ndarray,
    prior_scaling: Sequence[float] = (0.1, 0.1, 0.2, 0.2),
) -> jnp.ndarray:
    """Decode regression outputs into corner boxes.

    Args:
      locations: [..., N, 4] predicted offsets in (cx, cy, w, h) order.
      anchors_cyxhw: [N, 4] flat anchors (cy, cx, h, w).
      prior_scaling: variance-style scaling, same as encode.

    Returns:
      [..., N, 4] boxes (ymin, xmin, ymax, xmax), not clipped.
    """
    acy, acx, ah, aw = (
        anchors_cyxhw[:, 0],
        anchors_cyxhw[:, 1],
        anchors_cyxhw[:, 2],
        anchors_cyxhw[:, 3],
    )
    s0, s1, s2, s3 = prior_scaling
    cx = locations[..., 0] * aw * s0 + acx
    cy = locations[..., 1] * ah * s1 + acy
    w = aw * jnp.exp(locations[..., 2] * s2)
    h = ah * jnp.exp(locations[..., 3] * s3)
    return jnp.stack([cy - h / 2.0, cx - w / 2.0, cy + h / 2.0, cx + w / 2.0], axis=-1)
