"""Inference: end-to-end jitted detection pipelines."""

from .detector import DetectionConfig, Detector, RealtimeConfig, RealtimeDetector

__all__ = ["DetectionConfig", "Detector", "RealtimeConfig", "RealtimeDetector"]
