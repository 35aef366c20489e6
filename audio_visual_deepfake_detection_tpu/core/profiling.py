"""Profiling / tracing hooks.

The reference has no profiler — only wall-clock AverageMeters
(train_utils.py:286,319-323). TPU-native observability:
- ``trace(logdir)``: context manager around ``jax.profiler`` producing an
  xprof/tensorboard trace of device execution,
- ``StepTimer``: wall-clock meter with device sync, reporting steps/s and
  videos/s in the reference's console format,
- ``annotate``: named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """NOTE: on the tunneled axon backend of this dev environment
    ``start_trace`` blocks (the plugin has no profiler endpoint); use on
    directly-attached TPU hosts. StepTimer/annotate work everywhere."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, sync_every: int = 20):
        self.sync_every = sync_every
        self.count = 0
        self.total = 0.0
        self._start = time.perf_counter()

    def step(self, sync_value=None) -> Optional[float]:
        """Call once per step; returns seconds/step every sync_every steps."""
        self.count += 1
        if self.count % self.sync_every == 0:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            now = time.perf_counter()
            per_step = (now - self._start) / self.sync_every
            self.total += now - self._start
            self._start = now
            return per_step
        return None
