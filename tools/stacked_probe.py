#!/usr/bin/env python3
"""On-chip probe for the stacked-region batched mega kernel.

For each (batch, chunk) point: compile the flagship without-PQC stacked
kernel, check numerics against the XLA step path (one dispatch, loose TPU
tolerance), then measure us/stream-frame with the bench's RTT-cancelling
two-point fit. Records the r3-verdict #4 outcome (beat 12.9 us/stream at
B=16, or document the dead-end) — results table in docs/SCALING.md.

Usage: python tools/stacked_probe.py [--points B:CHUNK,B:CHUNK,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", default="4:300,4:1200,8:600,8:300,16:300")
    parser.add_argument("--fits", type=int, default=3)
    parser.add_argument("--frames", type=int, default=1600,
                        help="long-scan frames at chunk 300 (scaled down "
                        "for larger chunks)")
    parser.add_argument("--pqc", action="store_true",
                        help="probe the symAD PQC codec instead of the "
                        "without-PQC flagship")
    parser.add_argument("--vocoder", action="store_true",
                        help="probe the stacked HiFiGAN v1 vocoder rx "
                        "(ops/vocoder_stacked.py) instead of the codec")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.ops.mega_stacked import (
        make_mega_stream_stacked,
    )
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    if args.vocoder:
        from dl_speech_enhancement_tpu.models import HiFiGANGenerator
        from dl_speech_enhancement_tpu.ops.vocoder_stacked import (
            make_stacked_vocoder,
        )

        voc = HiFiGANGenerator(
            in_channels=64, out_channels=1, channels=512, kernel_size=7,
            upsample_scales=(5, 5, 4, 3),
            upsample_kernel_sizes=(10, 10, 8, 6),
            resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
            groups=3)
        v_params = voc.init(jax.random.PRNGKey(1))

        @jax.jit
        def xla_step_voc(cache, z):
            return voc.step(v_params, cache, z)
    else:
        gen = AudioDecGenerator(use_pqc=args.pqc)
        params, vq_state = gen.init(jax.random.PRNGKey(0))
        flat_cb = gen.flat_codebook(vq_state) if args.pqc else None

        @jax.jit
        def xla_step(cache, x):
            z, ec = gen.encode_step(params, cache, x)
            if args.pqc:
                z = gen.lookup(flat_cb, gen.quantize(vq_state, z))
            y, dc = gen.decode_step(params, cache, z)
            nc = dict(cache)
            nc.update(ec)
            nc.update(dc)
            return y, nc

    for point in args.points.split(","):
        B, chunk = (int(v) for v in point.split(":"))
        label = f"B={B} chunk={chunk}" + (" voc" if args.vocoder else "")
        try:
            t0 = time.time()
            if args.vocoder:
                z_rows = chunk // voc.total_upsample
                init_cache, run = make_stacked_vocoder(
                    voc, v_params, chunk, batch=B)

                def make_frames(n):
                    return (rng.standard_normal((n, B, z_rows, 64)) * 0.5
                            ).astype(np.float32)
            else:
                init_cache, run = make_mega_stream_stacked(
                    gen, params, chunk, batch=B,
                    vq_state=vq_state if args.pqc else None)

                def make_frames(n):
                    return (rng.standard_normal((n, B, chunk)) * 0.3
                            ).astype(np.float32)

            @jax.jit
            def run_e(cache, frames, _run=run):
                out, *_ = _run(cache, frames)
                return jnp.sum(jnp.square(out))

            # numerics: 2 frames vs the XLA step path, stream 0 and B-1
            frames = make_frames(2)
            out, *_ = jax.jit(run)(init_cache(), jnp.asarray(frames))
            out = np.asarray(out)
            compile_s = time.time() - t0
            errs = []
            for b in (0, B - 1):
                if args.vocoder:
                    c = voc.init_cache(1)
                    ref = []
                    for f in frames:
                        y, c = xla_step_voc(c, jnp.asarray(f[b][None]))
                        ref.append(np.asarray(y)[0, :, 0])
                else:
                    c = gen.init_cache(1)
                    ref = []
                    for f in frames:
                        y, c = xla_step(c, jnp.asarray(f[b][None, :, None]))
                        ref.append(np.asarray(y)[0, :, 0])
                ref = np.stack(ref)
                denom = float(np.mean(ref**2)) + 1e-12
                errs.append(float(np.mean((out[:, b] - ref) ** 2)) / denom)
            snr_db = -10 * np.log10(max(errs) + 1e-30)
            if snr_db < 25:  # bf16 weights vs f32 XLA: expect ~40 dB
                print(f"{label}: NUMERICS BAD ({snr_db:.1f} dB)", flush=True)
                continue

            n_hi = max(args.frames * 300 // chunk, 8)
            n1, n2 = n_hi // 4, n_hi

            def timed(n):
                fr = jax.device_put(make_frames(n))
                _ = float(run_e(init_cache(), fr))
                best = float("inf")
                for _ in range(3):
                    s = time.perf_counter()
                    _ = float(run_e(init_cache(), fr))
                    best = min(best, time.perf_counter() - s)
                return best

            fits = []
            for _ in range(args.fits):
                fits.append((timed(n2) - timed(n1)) / (n2 - n1))
            med = float(np.median(fits))
            spread = (np.max(fits) - np.min(fits)) / med * 100
            # us per 1200-sample (25 ms) frame per stream:
            us_sf = med * 1e6 / B * (1200 / chunk)
            print(f"{label}: {med*1e6:.1f} us/step, {us_sf:.2f} us per "
                  f"25ms-frame/stream (spread {spread:.0f}%, "
                  f"match {snr_db:.0f} dB, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
