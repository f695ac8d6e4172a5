"""Profiling and throughput instrumentation.

The reference has no profiling hooks (SURVEY section 5); this framework
adds jax.profiler trace capture and simple steps/sec counters for the hot
loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
  """Captures a jax.profiler trace (view with TensorBoard/XProf)."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Throughput:
  """Steps/sec (or items/sec) counter with warmup exclusion.

  Usage:
    meter = Throughput(warmup=2)
    for _ in range(n):
      ...run a step...
      meter.tick(items=batch_size)
    print(meter.rate())
  """

  def __init__(self, warmup: int = 1):
    self._warmup = warmup
    self._count = 0
    self._items = 0.0
    self._start: Optional[float] = None

  def tick(self, items: float = 1.0) -> None:
    self._count += 1
    if self._count == self._warmup:
      self._start = time.perf_counter()
      self._items = 0.0
      return
    if self._count > self._warmup:
      self._items += items

  def rate(self) -> float:
    if self._start is None or self._items == 0:
      return 0.0
    return self._items / (time.perf_counter() - self._start)


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None) -> Iterator[None]:
  """Wall-clock timer; stores seconds into results[label] if given."""
  t0 = time.perf_counter()
  try:
    yield
  finally:
    dt = time.perf_counter() - t0
    if results is not None:
      results[label] = dt
    else:
      print(f'{label}: {dt:.3f}s')
