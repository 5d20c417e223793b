#!/usr/bin/env python3
"""Probe: paired-preset serving throughput — full AudioDec v1 streams/chip.

The fleet layer (parallel/serve.py) serves the reference zoo's paired
presets: symAD analyzer tx -> residual-VQ quantize -> codebook lookup ->
HiFiGAN vocoder rx (utils/audiodec.py v0-v3 pairings). This measures how
many such FULL pipelines (codec analyzer + 19 M-param v1 vocoder) one
chip sustains in real time at several stream batches, using the same
step composition as the fleet (one scan over frames, caches carried).

Methodology matches bench.py: RTT-cancelling two-point fits over two scan
lengths, repeated, median +/- spread. The reference runs ONE such pipeline
at ~0.34x realtime on its laptop baseline (poster Table 2).

Usage: python tools/serve_pair_probe.py [--batches 1,4,16,64]
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
    ap.add_argument("--batches", default="1,4,16,64")
    ap.add_argument("--n-frames", type=int, default=400)
    ap.add_argument("--fits", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANGenerator,
    )
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    sample_rate = 48000
    frame_size = 1200  # 25 ms
    gen = AudioDecGenerator(use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(0))
    flat_cb = gen.flat_codebook(vq_state)
    # AudioDec v1 vocoder shape (configs/vocoder/AudioDec_v1_*.yaml):
    # grouped fast-decoder MultiGroupConv1d variant, ~19 M params
    voc = HiFiGANGenerator(
        in_channels=64, channels=512, kernel_size=7,
        upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
        resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
        groups=3)
    assert voc.total_upsample == gen.hop
    v_params = voc.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)

    def step(cache, frame):
        tx_cache, rx_cache = cache
        z, enc_cache = gen.encode_step(params, tx_cache, frame)
        idx = gen.quantize(vq_state, z)
        zq = gen.lookup(flat_cb, idx)
        y, new_rx = voc.step(v_params, rx_cache, zq)
        new_tx = dict(tx_cache)
        new_tx.update(enc_cache)
        return (new_tx, new_rx), jnp.sum(jnp.square(y))

    @jax.jit
    def run(cache, frames):
        cache, energies = lax.scan(step, cache, frames)
        return jnp.sum(energies)

    def init_cache(b):
        tx = {k: v for k, v in gen.init_cache(b).items()
              if k in ("encoder", "projector")}
        return (tx, voc.init_cache(b))

    def fit_once(b, n_hi):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = init_cache(b)
            frames = jax.device_put(
                rng.standard_normal((n, b, frame_size, 1)).astype(np.float32))
            _ = float(run(cache, frames))  # compile + settle
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(run(cache, frames))  # value fetch = fence
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    frame_s = frame_size / sample_rate
    out = {"metric": "audiodec_v1_paired_streams_per_chip", "batches": {}}
    for b in [int(x) for x in args.batches.split(",")]:
        n_hi = max(40, args.n_frames // max(1, b // 4))
        fits = [fit_once(b, n_hi) for _ in range(args.fits)]
        med = float(np.median(fits))
        spread = float((np.max(fits) - np.min(fits)) / med * 100)
        per_stream = med / b
        out["batches"][b] = {
            "frame_ms": round(med * 1e3, 3),
            "us_per_stream_frame": round(per_stream * 1e6, 2),
            "realtime_stream_equivalents": round(frame_s / per_stream, 1),
            "spread_pct": round(spread, 1),
        }
        print(json.dumps({"batch": b, **out["batches"][b]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
