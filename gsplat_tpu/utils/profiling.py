"""Tracing / profiling utilities (SURVEY.md §5 aux-subsystem parity).

The reference measures per-iteration wall time with paired CUDA events
(train_static.py:53-54,104) and logs ``iter_time`` to TensorBoard. Here:

- ``StepTimer``: host-side EMA step timer with block_until_ready semantics
  (the TPU analogue of cudaEvent elapsed_time).
- ``trace(logdir)``: context manager around ``jax.profiler`` — produces an
  XPlane trace viewable in TensorBoard/Perfetto with per-op XLA timings,
  something the reference has no equivalent of.
- ``annotate(name)``: TraceAnnotation passthrough for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """EMA per-step timer; call .tick(result) once per step."""

    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self.ema_ms: Optional[float] = None
        self._last = time.perf_counter()

    def tick(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt_ms = (now - self._last) * 1000.0
        self._last = now
        self.ema_ms = (dt_ms if self.ema_ms is None
                       else self._ema_coef * self.ema_ms
                       + (1 - self._ema_coef) * dt_ms)
        return dt_ms


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/op-level trace for TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region that shows up in captured traces."""
    return jax.profiler.TraceAnnotation(name)
