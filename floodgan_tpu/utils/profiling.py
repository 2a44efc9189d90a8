"""Profiling hooks (SURVEY.md §5: the reference only prints per-epoch
wall-clock; the TPU build provides jax.profiler traces + per-step timing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``profile_dir`` (view with
    TensorBoard / xprof).  No-op when dir is None."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with warmup discard — the measurement
    convention of the reference's Inference column (models/group.py:198-200
    drops the first 5 samples)."""

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() called before start()")
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        return dt

    @property
    def mean(self) -> float:
        kept = self.samples[self.warmup:] or self.samples
        if not kept:
            return float("nan")  # no samples recorded (e.g. empty split)
        return sum(kept) / len(kept)

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m else float("inf")
