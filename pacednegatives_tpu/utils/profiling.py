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


def t5_forward_flops(cfg, n_seqs: int, l_enc: int, l_dec: int) -> float:
    """Analytic matmul FLOPs for ONE forward pass of the T5 stack.

    MFU convention: useful model FLOPs only (no remat recompute). Encoder
    and decoder token counts are split — monoT5 decodes only the ~2 label
    tokens, so charging decoder params for encoder positions (the
    ``2 * n_params * total_tokens`` shortcut) overstates FLOPs ~2.5x at
    prompt lengths ~190.

    Terms per layer: Q/K/V/O projections, attention scores+values, FFN
    (2 or 3 matmuls for gated), plus cross-attention (K/V projected from
    the l_enc encoder outputs, Q/O and scores on the l_dec positions) and
    the tied LM head.
    """
    h, dk, dm, dff = cfg.num_heads, cfg.d_kv, cfg.d_model, cfg.d_ff
    ffn_mats = 3 if cfg.gated_ffn else 2

    def proj(tokens, n_mats):  # (tokens, dm) x (dm, h*dk) matmuls
        return 2.0 * tokens * dm * h * dk * n_mats

    def ffn(tokens):
        return 2.0 * tokens * dm * dff * ffn_mats

    def attn(q_tokens, k_len):  # scores + values
        return 4.0 * q_tokens * k_len * h * dk

    enc = cfg.num_layers * (proj(l_enc, 4) + attn(l_enc, l_enc) + ffn(l_enc))
    dec_self = proj(l_dec, 4) + attn(l_dec, l_dec)
    dec_cross = proj(l_dec, 2) + proj(l_enc, 2) + attn(l_dec, l_enc)
    dec = cfg.num_decoder_layers * (dec_self + dec_cross + ffn(l_dec))
    lm_head = 2.0 * l_dec * dm * cfg.vocab_size
    return float(n_seqs) * (enc + dec + lm_head)


def t5_step_flops(cfg, n_seqs: int, l_enc: int, l_dec: int = 2) -> float:
    """Model FLOPs for one train step: forward + backward = 3x forward."""
    return 3.0 * t5_forward_flops(cfg, n_seqs, l_enc, l_dec)


# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets)
PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,  # v6e / Trillium
    "v6e": 918e12,
}


def device_peak_flops(device=None) -> float | None:
    """Best-effort bf16 peak for the current accelerator (None if unknown,
    e.g. CPU)."""
    d = device or jax.devices()[0]
    name = getattr(d, "device_kind", str(d)).lower()
    for key, peak in PEAK_FLOPS.items():
        if key in name:
            return peak
    return None


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
