"""Tracing / profiling subsystem.

The reference has only vestigial ``time.time()`` stamps that are never
reported (ref:train.py:66,93,103 — SURVEY.md §5).  Here profiling is a real
facility:

- ``StepTimer``: wall-clock per-step timing with percentile summary, used by
  the training loop and benchmarks.
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard-
  loadable trace directory.
- ``device_memory_stats``: live HBM usage per device.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Collects step durations; call ``tick()`` once per step."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / np.mean(self._times) if self._times else float("nan")

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {"steps": len(t),
                "mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3),
                "steps_per_sec": float(1.0 / t.mean())}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open the directory with TensorBoard or
    xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    import jax
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = dict(d.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(d),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit")})
    return out


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Point jax at the on-disk compilation cache the benches share
    (first TPU compiles take minutes through the remote tunnel)."""
    import os
    import jax
    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/eamm_jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
