"""Fixed-shape, vectorized detection ops (the `tf_extended` + `ssd_common`
capability surface, re-designed for XLA)."""

from . import anchors, ap, boxes, decode, encode, matching, nms, select
from .math import (
    abs_smooth,
    cummax,
    exact_top_k_chunked,
    safe_divide,
    smooth_l1,
    softmax_ce,
)

__all__ = [
    "anchors",
    "ap",
    "boxes",
    "decode",
    "encode",
    "matching",
    "nms",
    "select",
    "abs_smooth",
    "exact_top_k_chunked",
    "softmax_ce",
    "cummax",
    "safe_divide",
    "smooth_l1",
]
