"""Profiling: step timing + on-demand XLA profiler traces.

The reference only logged wall-clock sec/batch
(ref: ron_net_multi_gpu_replica.py:439-444, eval_ron_network.py:362-366);
here profiling is first-class: `jax.profiler` traces viewable in
TensorBoard/Perfetto, plus a cheap rolling step timer.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed steps."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling sec/step + images/sec."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def sec_per_step(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def images_per_sec(self, batch_size: int) -> float:
        s = self.sec_per_step
        return batch_size / s if s > 0 else 0.0
