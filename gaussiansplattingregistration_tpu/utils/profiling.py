"""Tracing/profiling helpers (absent in the reference, SURVEY.md §5.1).

Thin wrappers over the JAX profiler plus wall-clock phase timing, so every
driver can be traced to TensorBoard with one flag and perf numbers are
first-class.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """TensorBoard-compatible device trace (`jax.profiler.trace`); no-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named span visible in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    """Accumulating phase timer: `with sw("project"): ...`; `.summary()`."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self._count[k],
                "mean_ms": round(v / self._count[k] * 1000, 3)}
            for k, v in self._acc.items()
        }


def timed(fn, *args, iters: int = 5, warmup: int = 1):
    """Steady-state timing of a jitted callable: returns (seconds, output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
