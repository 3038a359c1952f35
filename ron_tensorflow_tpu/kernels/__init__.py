"""Pallas TPU kernels for the framework's custom hot ops."""

from .fused_conv_pool import (
    fused_conv3x3_relu_pool2,
    fused_stem_conv_relu_pool2,
    fused_vgg_block1,
)
from .nms_pallas import (
    nms_sorted_pallas,
    pallas_nms_fixpoint_keep_mask,
    pallas_nms_keep_mask,
)

__all__ = [
    "fused_conv3x3_relu_pool2",
    "fused_stem_conv_relu_pool2",
    "fused_vgg_block1",
    "nms_sorted_pallas",
    "pallas_nms_fixpoint_keep_mask",
    "pallas_nms_keep_mask",
]
