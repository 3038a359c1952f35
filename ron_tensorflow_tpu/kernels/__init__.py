"""Pallas TPU kernels for the framework's custom hot ops."""

from .nms_pallas import pallas_nms_keep_mask

__all__ = ["pallas_nms_keep_mask"]
