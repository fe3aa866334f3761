"""Tracing / profiling / debugging utilities.

Replaces the reference's telemetry surface (SURVEY.md §5): Lightning
``profiler='simple'`` (train/train_lce.py:84), the HF fork's
TrainerMemoryTracker + total_flos accounting (utilities/trainer.py:113,
707-715), and adds what the reference lacks: XLA-level traces and NaN
checking.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args, **kwargs) -> dict[str, float]:
    """Compile-time cost analysis of a jitted function: flops, bytes
    accessed (the HF fork's ``total_flos`` equivalent, from the compiler
    instead of a hand model)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):  # older jax returns per-device list
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", 0.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
    }


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: any NaN produced under jit raises immediately
    (the determinism/sanitizer knob the reference lacks, SURVEY.md §5)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Simple-profiler-style aggregate timings (per section)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / self.counts[k],
            }
            for k in self.totals
        }
