#!/usr/bin/env python3
"""Probe: does bf16 end-to-end serving beat f32 at large stream batches?

Rationale: at batch 128 the streams/chip path is activation-HBM-bound
(~0.7 ms per 128-stream frame implies several hundred MB of f32 activation
traffic per step).  The TPU already evaluates f32 convs at reduced
(bf16-ish) internal precision (see CLAUDE.md), so running activations —
and optionally weights — in bf16 halves HBM bytes for roughly the same
numerics.  This script times the batched XLA scan path at several batch
sizes in {f32, bf16-weights, bf16-everything} and reports per-stream
frame time, plus an output-SNR check vs the f32 path.

Usage: python tools/serve_dtype_probe.py [--batches 16,128,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,128,256")
    ap.add_argument("--n-frames", type=int, default=200)
    ap.add_argument("--fits", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    frame_size = 1200
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def make_run(p):
        def chunk_step(cache, x):
            z, enc_cache = gen.encode_step(p, cache, x)
            y, dec_cache = gen.decode_step(p, cache, z)
            new_cache = dict(cache)
            new_cache.update(enc_cache)
            new_cache.update(dec_cache)
            return new_cache, jnp.sum(jnp.square(y.astype(jnp.float32)))

        @jax.jit
        def run(cache, frames):
            cache, energies = lax.scan(chunk_step, cache, frames)
            return jnp.sum(energies)

        return run

    p_f32 = params
    p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    run_f32 = make_run(p_f32)
    run_bf16w = make_run(p_bf16)   # weights bf16; activation dtype follows x

    def fit(run, batch, act_dtype, n_hi):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = jax.tree.map(lambda a: a.astype(act_dtype),
                                 gen.init_cache(batch))
            frames = jax.device_put(
                rng.standard_normal((n, batch, frame_size, 1))
                .astype(np.float32).astype(act_dtype))
            _ = float(run(cache, frames))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    results = {}
    for batch in [int(b) for b in args.batches.split(",")]:
        n_hi = max(40, min(args.n_frames, 25600 // batch * 4))
        row = {}
        for name, run, act in [
            ("f32", run_f32, jnp.float32),
            ("bf16w_f32a", run_bf16w, jnp.float32),
            ("bf16", run_bf16w, jnp.bfloat16),
        ]:
            fits = [fit(run, batch, act, n_hi) for _ in range(args.fits)]
            med = float(np.median(fits))
            row[name] = {
                "frame_ms": round(med * 1e3, 4),
                "us_per_stream": round(med / batch * 1e6, 3),
                "spread_pct": round(
                    (max(fits) - min(fits)) / med * 100, 1),
            }
        results[f"batch_{batch}"] = row
        print(json.dumps({f"batch_{batch}": row}))

    # numerics: denoised output SNR of each variant vs the f32 path
    batch = 4
    n = 40
    frames32 = rng.standard_normal((n, batch, frame_size, 1)).astype(np.float32)

    def stream_out(p, act_dtype):
        def chunk_step(cache, x):
            z, ec = gen.encode_step(p, cache, x)
            y, dc = gen.decode_step(p, cache, z)
            nc = dict(cache)
            nc.update(ec)
            nc.update(dc)
            return nc, y

        cache = jax.tree.map(lambda a: a.astype(act_dtype),
                             gen.init_cache(batch))
        _, ys = lax.scan(chunk_step, cache, jnp.asarray(frames32, act_dtype))
        return np.asarray(ys.astype(jnp.float32))

    ref = stream_out(p_f32, jnp.float32)
    for name, p, act in [("bf16w_f32a", p_bf16, jnp.float32),
                         ("bf16", p_bf16, jnp.bfloat16)]:
        y = stream_out(p, act)
        snr = 10 * np.log10(np.sum(ref ** 2) / (np.sum((y - ref) ** 2) + 1e-30))
        print(json.dumps({f"snr_db_vs_f32_{name}": round(float(snr), 1)}))


if __name__ == "__main__":
    main()
