#!/usr/bin/env python3
"""Mega-kernel perf probes beyond bench.py's headline (real chip).

Measures, with bench.py's RTT-cancelling two-point-fit methodology
(median of N fits, min-of-trials per point):

- PQC codec stream at weight_dtype bf16 vs f32 — the cost of the
  bit-exact-wire-parity configuration (see ops/mega_kernel.py docstring on
  near-tie codeword assignment at bf16).
- without-PQC mega kernel at larger chunk sizes (50/100 ms frames) — the
  deep levels only see chunk/hop rows per grid step, so bigger chunks feed
  the MXU more rows per matmul; relevant for offline/throughput use, not
  the 25 ms live path.

Usage: python tools/mega_probe.py [--fits 5]
Prints one JSON object (not the driver bench line — bench.py owns that).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fits", type=int, default=5)
    parser.add_argument("--frames", type=int, default=1600,
                        help="frames per long dispatch at chunk=1200")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    sample_rate = 48000
    rng = np.random.default_rng(0)

    def fit(run, init_cache, chunk, n_hi, trials=3):
        def timed(n):
            cache = init_cache()
            frames = jax.device_put(
                rng.standard_normal((n, chunk)).astype(np.float32))
            _ = float(run(cache, frames))  # compile + settle
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))  # scalar fetch = fence
                best = min(best, time.perf_counter() - t0)
            return best

        n1, n2 = n_hi // 4, n_hi
        return (timed(n2) - timed(n1)) / (n2 - n1)

    def measure(gen, params, vq_state, chunk, weight_dtype, n_hi):
        init_cache, mega_run = make_mega_stream(
            gen, params, chunk=chunk, weight_dtype=weight_dtype,
            vq_state=vq_state)
        if gen.use_pqc:
            @jax.jit
            def run(cache, frames):
                out, _, codes = mega_run(cache, frames)
                return jnp.sum(jnp.square(out)) + jnp.sum(codes)
        else:
            @jax.jit
            def run(cache, frames):
                out, _ = mega_run(cache, frames)
                return jnp.sum(jnp.square(out))

        fits = [fit(run, init_cache, chunk, n_hi) for _ in range(args.fits)]
        med = float(np.median(fits))
        spread = float((np.max(fits) - np.min(fits)) / med * 100.0)
        return med, spread

    out = {}

    # PQC: wire-parity (f32) vs default (bf16) weights, 25 ms frames
    pqc = AudioDecGenerator(use_pqc=True)
    pqc_params, pqc_vq = pqc.init(jax.random.PRNGKey(0))
    for name, wd in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        t, s = measure(pqc, pqc_params, pqc_vq, 1200, wd, args.frames * 4)
        out[f"pqc_frame_us_{name}"] = round(t * 1e6, 2)
        out[f"pqc_spread_pct_{name}"] = round(s, 1)
        out[f"pqc_x_realtime_{name}"] = round((1200 / sample_rate) / t, 1)

    # without-PQC: chunk scaling (normalize to us per 25 ms of audio)
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    for chunk in (1200, 2400, 4800):
        scale = chunk // 1200
        t, s = measure(gen, params, None, chunk, jnp.bfloat16,
                       args.frames * 4 // scale)
        out[f"plain_chunk{chunk}_us_per_25ms"] = round(t * 1e6 / scale, 2)
        out[f"plain_chunk{chunk}_spread_pct"] = round(s, 1)
        out[f"plain_chunk{chunk}_x_realtime"] = round(
            (chunk / sample_rate) / t, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
