"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5 — progress via tqdm
only). The TPU build provides: jax.profiler trace capture around any
code region (viewable in TensorBoard/Perfetto), a step timer with
device sync, and a simple throughput meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed region:

        with profiling.trace("/tmp/trace"):
            train_step(...)  # then: tensorboard --logdir /tmp/trace
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with an explicit device sync on the
    step output (plain time.time() around async dispatch measures only
    the enqueue)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._n = 0

    def step(self, outputs) -> Optional[float]:
        jax.block_until_ready(outputs)
        now = time.perf_counter()
        self._n += 1
        if self._n <= self.warmup:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self._times else 0.0


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out
