"""Profiling helpers.

The reference's observability is a pair of chrono accumulators around its
queue ops (``envpool/core/async_envpool.h:56,78-80``, SURVEY §5.1). Here
the equivalents are:

- ``StepTimer`` — host-side send/recv duration accumulators with the same
  dur_send/dur_recv split;
- ``trace`` — a context manager over ``jax.profiler`` so the on-device
  env programs show up in a TensorBoard-loadable trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator


class StepTimer:
  """Accumulates send/recv wall-times, like dur_send_/dur_recv_."""

  def __init__(self) -> None:
    self.dur_send = 0.0
    self.dur_recv = 0.0
    self.n_send = 0
    self.n_recv = 0

  @contextlib.contextmanager
  def send(self) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
      yield
    finally:
      self.dur_send += time.perf_counter() - t0
      self.n_send += 1

  @contextlib.contextmanager
  def recv(self) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
      yield
    finally:
      self.dur_recv += time.perf_counter() - t0
      self.n_recv += 1

  def summary(self) -> Dict[str, float]:
    return {
      "dur_send_s": self.dur_send,
      "dur_recv_s": self.dur_recv,
      "n_send": self.n_send,
      "n_recv": self.n_recv,
      "avg_send_ms": 1e3 * self.dur_send / max(self.n_send, 1),
      "avg_recv_ms": 1e3 * self.dur_recv / max(self.n_recv, 1),
    }


@contextlib.contextmanager
def trace(log_dir: str, **kwargs: Any) -> Iterator[None]:
  """Capture a jax profiler trace of the enclosed block."""
  import jax
  jax.profiler.start_trace(log_dir, **kwargs)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
