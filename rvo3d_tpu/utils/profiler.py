"""Profiling and numerics-debug helpers.

The reference's only instrumentation is wall-clock prints and an unused
latency list (SURVEY §5: multi_ppo.py:333-339, post_train.py:65-70). Here:
  - trace():      jax.profiler trace capture around any block (open the
                  dump with TensorBoard or xprof)
  - StepTimer:    steps/s + EMA step-time counters
  - debug_nans(): context manager enabling jax_debug_nans (the systematic
                  version of the reference's scattered NaN raise-guards,
                  ir_gym.py:232-239 / policy_rnn_ac.py:214-227)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rvo3d_trace") -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Optional[float] = None
        self._last = time.perf_counter()
        self.total_steps = 0

    def tick(self, steps: int = 1) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.total_steps += steps
        rate = steps / dt if dt > 0 else 0.0
        self._avg = rate if self._avg is None else (
            self.ema * self._avg + (1 - self.ema) * rate)
        return rate

    @property
    def steps_per_sec(self) -> float:
        return self._avg or 0.0
