"""Tracing/profiling hooks (SURVEY §5.1: the reference has none beyond
wall-clock prints, torch_ver/main.py:62,117-120).

- ``trace(dir)``: context manager around jax.profiler for TensorBoard-
  viewable XLA traces.
- ``StepTimer``: cheap per-step wall timing with EMA, for the metrics path.
- ``annotate``: named trace spans (jax.profiler.TraceAnnotation) so jit
  boundaries show up named in the profile.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg: Optional[float] = None
        self._t0: Optional[float] = None
        self.last: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        self._avg = (
            self.last
            if self._avg is None
            else self._ema * self._avg + (1 - self._ema) * self.last
        )
        return False

    @property
    def avg(self) -> Optional[float]:
        return self._avg

    def rate(self, items: int) -> Optional[float]:
        return items / self._avg if self._avg else None
