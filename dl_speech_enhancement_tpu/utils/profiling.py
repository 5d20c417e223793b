"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's only observability is wall-clock (per-utterance RTF in
bin/test.py:93-99, per-frame enc/dec timers + latency lists in
bin/stream.py:198-238). This module keeps those user-facing stats and adds
device-level tracing via ``jax.profiler`` — the traces open in
TensorBoard/Perfetto and show per-op TPU time, HBM traffic, and fusion
boundaries.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side step timing with mean/std/percentile reporting."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def stats(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "mean_ms": float(a.mean() * 1e3),
            "std_ms": float(a.std() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
            "n": len(a),
        }


def measure_rtf(fn, example_input, sample_rate: int, n_iters: int = 50,
                warmup: int = 5) -> dict:
    """Real-time factor of a jitted audio function (bin/test.py:93-106
    semantics: wall / audio_duration; lower is better)."""
    x = jax.numpy.asarray(example_input)
    audio_seconds = x.shape[1] / sample_rate
    out = fn(x)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(x)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / n_iters
    return {
        "rtf": wall / audio_seconds,
        "x_realtime": audio_seconds / wall,
        "wall_ms": wall * 1e3,
        "audio_seconds": audio_seconds,
    }
