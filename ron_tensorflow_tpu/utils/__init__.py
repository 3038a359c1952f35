"""Utilities: metrics logging, profiling, visualization, debug guards."""

from .summaries import MetricsWriter
from .profiling import StepTimer, profile_trace

__all__ = ["MetricsWriter", "StepTimer", "profile_trace"]
