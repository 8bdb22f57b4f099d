"""Profiling / tracing utilities.

The reference has essentially no tracing (SURVEY.md §5: IPOPT print_time +
a perf_counter in the MPC loop). Production TPU work needs more: this module
wraps ``jax.profiler`` traces and provides a simple timing+throughput
accounting helper used by the bench scripts.

Usage:
    with trace("plots/trace"):            # open in Perfetto/TensorBoard
        out = solve(batch)

    t = Timing()
    with t.span("solve"):
        np.asarray(solve(batch))
    print(t.report(work={"solve": n_flops}))
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timing:
    """Named wall-clock spans with optional FLOP-based roofline accounting."""

    def __init__(self):
        self.spans: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append(time.perf_counter() - t0)

    def best(self, name: str) -> float:
        return min(self.spans[name])

    def report(self, work: Optional[Dict[str, float]] = None,
               peak_flops: float = 197e12) -> str:
        """Per-span best wall time; with `work` (FLOPs per call), adds
        achieved FLOP/s and fraction of `peak_flops` (default: v5e f32
        ~197 TFLOP/s bf16/2)."""
        lines = []
        for name, ts in self.spans.items():
            best = min(ts)
            line = f"{name}: {best * 1e3:.2f} ms (n={len(ts)})"
            if work and name in work:
                rate = work[name] / best
                line += (f", {rate / 1e12:.2f} TFLOP/s"
                         f" ({100 * rate / peak_flops:.1f}% of peak)")
            lines.append(line)
        return "\n".join(lines)


def flops_tube_solve(B: int, N: int, n: int, m: int, outer: int,
                     inner: int) -> float:
    """Rough FLOP model of the structured tube solve (for roofline lines):
    per inner iteration, the banded factor+solve dominates at
    ~S * (b^3 + 6 b^2) with b = n+1+m, plus assembly ~S*b^2 terms."""
    b = n + 1 + m
    S = N + 1
    per_iter = S * (b ** 3 + 8 * b * b) * 4
    return float(B * outer * inner * per_iter)
