#!/usr/bin/env python3
"""Stream-major batched mega kernel: the round-2 verdict's proposed rebuild.

Round 2 measured the all-streams-per-grid-step batched mega kernel
(ops/mega_kernel.py::make_mega_stream_batched) at 41.6 us/stream-frame at
B=4 — losing to both the single-stream kernel (22.0 us) and XLA batching
(12.9 us/stream at B=16) because the Mosaic <8-row multi-page workaround
forces value-space staging of every cache slab. The proposed alternative
was a STREAM-MAJOR grid — ``grid=(B, frames)`` with per-stream VMEM cache
slabs and 2-D refs (no cross-page reshape at all).

This probe measures that design's cost model honestly without a second
1300-line kernel: on a v5e there is ONE sequential TensorCore, so a
stream-major grid executes stream b's frames as an uninterrupted run of
single-stream grid steps — identical work, identical VMEM residency, to
``lax.map``-ing the existing single-stream mega kernel over B streams
inside one jit (the map body IS the per-(b, i) grid step body; Mosaic
elides the weight re-fetch between consecutive grid steps either way, and
the extra per-kernel-launch overhead in the map variant only makes the
map an *upper* bound of the fused stream-major kernel by a per-dispatch
constant that the two-point fit cancels). The floor for EITHER is the
measured single-stream us/frame:

    stream-major us/stream-frame >= single-stream us/frame  (22.0 us)
                                 >  XLA batched us/stream   (12.9 us @16)

because stream-majoring adds zero cross-stream MXU row sharing — the only
thing batching has to offer. The arithmetic is decisive before any
implementation; this probe pins it with on-chip numbers and an exact
equivalence check.

Usage: python tools/mega_batched_probe.py [--batches 4,16] [--frames 400]
Prints one JSON line with per-stream us for lax.map(mega) vs XLA batch.
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
    ap.add_argument("--batches", default="4,16")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--fits", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    sample_rate = 48000
    frame_size = 1200
    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    mega_init, mega_run = make_mega_stream(gen, params, chunk=frame_size)

    def run_one(cache_and_frames):
        cache, frames = cache_and_frames
        out, new_cache = mega_run(cache, frames)
        return out

    @jax.jit
    def run_stream_major(caches, frames):
        """caches: {name: (B, ctx, lanes)}, frames: (B, N, frame) — the
        stream-major grid semantics: all of stream b, then stream b+1."""
        outs = lax.map(run_one, (caches, frames))
        return jnp.sum(jnp.square(outs))

    # XLA batched reference (bench.py's streams path)
    def chunk_step(cache, x):
        z, enc_c = gen.encode_step(params, cache, x)
        y, dec_c = gen.decode_step(params, cache, z)
        nc = dict(cache)
        nc.update(enc_c)
        nc.update(dec_c)
        return nc, jnp.sum(jnp.square(y))

    @jax.jit
    def run_xla(cache, frames):
        cache, es = lax.scan(chunk_step, cache, frames)
        return jnp.sum(es)

    # ---- exact equivalence: map-of-mega vs per-stream mega ----
    B0 = 2
    n0 = 4
    f = rng.standard_normal((B0, n0, frame_size)).astype(np.float32)
    caches0 = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[mega_init() for _ in range(B0)])
    outs = []
    for b in range(B0):
        o, _ = mega_run(mega_init(), jnp.asarray(f[b]))
        outs.append(np.asarray(o))
    got = float(run_stream_major(caches0, jnp.asarray(f)))
    want = float(np.sum(np.square(np.stack(outs))))
    rel = abs(got - want) / (abs(want) + 1e-12)
    print(f"equivalence: sum-sq rel err {rel:.3e}", flush=True)
    assert rel < 1e-4

    def fit_once(run, make_args, n_hi, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            a = make_args(n)
            _ = float(run(*a))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(*a))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    result = {"frame_size": frame_size, "per_batch": {}}
    frame_time = frame_size / sample_rate
    for B in [int(b) for b in args.batches.split(",")]:
        def make_sm(n, B=B):
            caches = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[mega_init() for _ in range(B)])
            frames = jax.device_put(rng.standard_normal(
                (B, n, frame_size)).astype(np.float32))
            return (caches, frames)

        def make_xla(n, B=B):
            cache = gen.init_cache(B)
            frames = jax.device_put(rng.standard_normal(
                (n, B, frame_size, 1)).astype(np.float32))
            return (cache, frames)

        t_sm, s_sm = median_spread(
            [fit_once(run_stream_major, make_sm, args.frames)
             for _ in range(args.fits)])
        t_xla, s_xla = median_spread(
            [fit_once(run_xla, make_xla, args.frames)
             for _ in range(args.fits)])
        result["per_batch"][str(B)] = {
            "stream_major_us_per_stream_frame": round(t_sm / B * 1e6, 2),
            "stream_major_spread_pct": round(s_sm, 1),
            "xla_us_per_stream_frame": round(t_xla / B * 1e6, 2),
            "xla_spread_pct": round(s_xla, 1),
            "stream_major_streams_per_chip": round(frame_time / (t_sm / B), 1),
            "xla_streams_per_chip": round(frame_time / (t_xla / B), 1),
        }
        print(f"B={B}: {result['per_batch'][str(B)]}", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
