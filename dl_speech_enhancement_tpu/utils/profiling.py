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
import os
import time

import jax
import numpy as np


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``<repo>/.cache/jax``.

    The big jitted programs here (GAN train steps ~100 s on the remote
    compile service, the full-size CPU dryrun ~3-4 min) dominate cold-start
    time; the persistent cache makes repeated bench/dryrun/training runs
    skip straight to execution. Call before building any jitted step.
    Best-effort: degrades silently if the config knobs are unavailable.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("DLSE_COMPILE_CACHE_DIR")
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".cache", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


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


def codec_flops_per_sample(gen) -> float:
    """MXU FLOPs per audio sample for the full streaming encode->decode
    chain of an :class:`AudioDecGenerator` (2 FLOPs per MAC).

    Rates are relative to the audio sample rate: a level below a stride-s
    downsample runs at 1/s of the audio rate. Transposed convs are charged
    ``2*k*cin*cout`` per *input* frame (each input frame touches k taps).
    Used by bench.py for the MFU/roofline accounting (VERDICT round 1,
    "What's weak" #2).
    """

    def conv_fl(k, cin, cout, rate):
        return 2.0 * k * cin * cout * rate

    enc, dec = gen.encoder, gen.decoder
    fl = 0.0
    rate = 1.0
    fl += conv_fl(enc.conv.kernel_size, enc.conv.in_channels,
                  enc.conv.out_channels, rate)
    for blk in enc.blocks:
        for u in blk.res_units:
            fl += conv_fl(u.conv1.kernel_size, u.conv1.in_channels,
                          u.conv1.out_channels, rate)
            fl += conv_fl(1, u.conv2.in_channels, u.conv2.out_channels, rate)
        rate /= blk.conv.stride
        fl += conv_fl(blk.conv.kernel_size, blk.conv.in_channels,
                      blk.conv.out_channels, rate)
    if gen.use_pqc:
        p = gen.projector.conv
        fl += conv_fl(p.kernel_size, p.in_channels, p.out_channels, rate)
        # codebook lookup/quantize distances are negligible vs the convs
        d1 = dec.conv1
        fl += conv_fl(d1.kernel_size, d1.in_channels, d1.out_channels, rate)
    for blk in dec.blocks:
        fl += conv_fl(blk.conv.kernel_size, blk.conv.in_channels,
                      blk.conv.out_channels, rate)
        rate *= blk.conv.stride
        for u in blk.res_units:
            fl += conv_fl(u.conv1.kernel_size, u.conv1.in_channels,
                          u.conv1.out_channels, rate)
            fl += conv_fl(1, u.conv2.in_channels, u.conv2.out_channels, rate)
    fl += conv_fl(dec.conv2.kernel_size, dec.conv2.in_channels,
                  dec.conv2.out_channels, rate)
    return fl


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
