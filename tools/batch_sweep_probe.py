#!/usr/bin/env python3
"""Explain the per-stream cost regression past batch 128 on the serving path.

bench.py's sweep showed XLA batched streaming denoise per-stream time
bottoming at B=128 (5.7 us/stream-frame, BENCH_r02) and regressing at
B=256+. This probe gathers the evidence to attribute that: for each batch
size it measures the RTT-cancelled per-stream-frame device time (bench.py
two-point fit) AND pulls XLA's own compiled cost analysis (flops,
bytes accessed) for the scanned step, so the regression can be split into

- compute growth (flops/stream should be flat in B),
- memory-traffic growth (bytes/stream flat = perfectly batched; growing =
  cache/activation layout stops amortizing),
- neither (scheduling/occupancy — visible as time growing with flat
  flops+bytes).

Usage: python tools/batch_sweep_probe.py [--batches 64,128,256,512]
Prints one JSON line; findings belong in docs/SCALING.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def median_spread(xs):
    med = float(np.median(xs))
    spread = float((np.max(xs) - np.min(xs)) / med * 100.0) if med else 0.0
    return med, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--fits", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    sample_rate = 48000
    frame_size = 1200
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def chunk_step(cache, x):
        z, enc_c = gen.encode_step(params, cache, x)
        y, dec_c = gen.decode_step(params, cache, z)
        nc = dict(cache)
        nc.update(enc_c)
        nc.update(dec_c)
        return nc, jnp.sum(jnp.square(y))

    @jax.jit
    def run(cache, frames):
        cache, es = lax.scan(chunk_step, cache, frames)
        return jnp.sum(es)

    def fit_once(B, n_hi, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = gen.init_cache(B)
            frames = jax.device_put(rng.standard_normal(
                (n, B, frame_size, 1)).astype(np.float32))
            _ = float(run(cache, frames))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    frame_time = frame_size / sample_rate
    out = {"frame_size": frame_size, "per_batch": {}}
    for B in [int(b) for b in args.batches.split(",")]:
        n_hi = max(args.frames * 128 // B, 16)
        fits = [fit_once(B, n_hi) for _ in range(args.fits)]
        t, spread = median_spread(fits)
        rec = {
            "us_per_stream_frame": round(t / B * 1e6, 3),
            "spread_pct": round(spread, 1),
            "streams_per_chip": round(frame_time / (t / B), 1),
        }
        # XLA's own cost model for the whole scanned program, per frame
        # per stream (n_hi frames scanned)
        try:
            cache = gen.init_cache(B)
            frames = jnp.zeros((n_hi, B, frame_size, 1), jnp.float32)
            an = run.lower(cache, frames).compile().cost_analysis()
            if an:
                if an.get("flops"):
                    rec["flops_per_stream_frame"] = round(
                        float(an["flops"]) / n_hi / B)
                if an.get("bytes accessed"):
                    rec["hbm_bytes_per_stream_frame"] = round(
                        float(an["bytes accessed"]) / n_hi / B)
        except Exception as e:
            rec["cost_analysis_error"] = str(e)[:120]
        out["per_batch"][str(B)] = rec
        print(f"B={B}: {rec}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
