#!/usr/bin/env python3
"""On-chip probe for the fused HiFiGAN vocoder pipeline
(ops/vocoder_kernel.py): verifies equivalence vs the XLA streaming step and
measures per-frame device time with the repeated two-point fit from
bench.py (RTT-cancelling; see CLAUDE.md on the tunneled backend).

Usage: python tools/vocoder_probe.py [--preset v1|v0] [--chunk 1200]
       [--weight-dtype f32|bf16] [--budget BYTES] [--skip-chain]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_spread(xs):
    med = float(np.median(xs))
    spread = float((np.max(xs) - np.min(xs)) / med * 100.0) if med else 0.0
    return med, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="v1", choices=["v0", "v1"])
    ap.add_argument("--chunk", type=int, default=1200)
    ap.add_argument("--weight-dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--budget", type=int, default=9_000_000)
    ap.add_argument("--n-frames", type=int, default=400)
    ap.add_argument("--fits", type=int, default=5)
    ap.add_argument("--skip-chain", action="store_true")
    ap.add_argument("--group-pack-max-lanes", type=int, default=128,
                    help="0 disables MultiGroupConv1d group packing "
                    "(the on/off A/B for docs/SCALING.md)")
    ap.add_argument("--transient-mode", default="max", choices=["max", "sum"],
                    help="per-op temporary accounting in the packer: 'max' "
                    "(round-5 merged packing) or 'sum' (round-4, 14 segs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dl_speech_enhancement_tpu.models.hifigan import HiFiGANGenerator
    from dl_speech_enhancement_tpu.ops.vocoder_kernel import make_mega_vocoder
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    sample_rate = 48000
    chunk = args.chunk
    wd = jnp.float32 if args.weight_dtype == "f32" else jnp.bfloat16

    if args.preset == "v1":
        voc = HiFiGANGenerator(
            in_channels=64, out_channels=1, channels=512, kernel_size=7,
            upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
            resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),),
            groups=3)
    else:
        voc = HiFiGANGenerator(
            in_channels=64, out_channels=1, channels=512, kernel_size=7,
            upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilations=((1, 3, 5),) * 3, groups=1)
    params = voc.init(jax.random.PRNGKey(0))
    hop = voc.total_upsample
    z_rows = chunk // hop
    rng = np.random.default_rng(0)

    init_cache, mega_run = make_mega_vocoder(
        voc, params, chunk, weight_dtype=wd, seg_budget_bytes=args.budget,
        group_pack_max_lanes=args.group_pack_max_lanes,
        transient_mode=args.transient_mode)
    print(f"segments: {mega_run.num_segments} "
          f"(group_pack_max_lanes={args.group_pack_max_lanes})")

    # ---- equivalence on a short stream ----
    zq_np = rng.standard_normal((8, z_rows, 64)).astype(np.float32)
    zq = jax.device_put(zq_np)

    @jax.jit
    def run_mega_eq(cache, z):
        return mega_run(cache, z)

    out_mega, _ = run_mega_eq(init_cache(), zq)
    out_mega = np.asarray(out_mega)

    def step(cache, z):
        y, new_cache = voc.step(params, cache, z[None])
        return new_cache, y[0, :, 0]

    @jax.jit
    def run_xla_eq(cache, z):
        cache, ys = lax.scan(step, cache, z)
        return ys

    out_xla = np.asarray(run_xla_eq(voc.init_cache(1), zq))
    err = float(np.max(np.abs(out_mega - out_xla)))
    ref = float(np.max(np.abs(out_xla)) + 1e-12)
    print(f"equivalence: max|diff|={err:.3e} (rel {err / ref:.3e})")

    # ---- timing ----
    @jax.jit
    def run_mega(cache, z):
        out, _ = mega_run(cache, z)
        return jnp.sum(jnp.square(out))

    @jax.jit
    def run_xla(cache, z):
        cache, ys = lax.scan(step, cache, z)
        return jnp.sum(jnp.square(ys))

    def fit_once(run, cache_fn, n_hi, trials=3):
        n1, n2 = n_hi // 4, n_hi

        def timed(n):
            cache = cache_fn()
            z = jax.device_put(
                rng.standard_normal((n, z_rows, 64)).astype(np.float32))
            _ = float(run(cache, z))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = float(run(cache, z))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n2) - timed(n1)) / (n2 - n1)

    def measure(run, cache_fn, n_hi):
        return median_spread([fit_once(run, cache_fn, n_hi)
                              for _ in range(args.fits)])

    t_xla, s_xla = measure(run_xla, lambda: voc.init_cache(1), args.n_frames)
    t_mega, s_mega = measure(run_mega, init_cache, args.n_frames * 2)
    frame_time = chunk / sample_rate
    result = {
        "preset": args.preset, "chunk": chunk, "weight_dtype": args.weight_dtype,
        "segments": mega_run.num_segments, "equiv_max_abs": err,
        "xla_us_frame": t_xla * 1e6, "xla_spread_pct": s_xla,
        "mega_us_frame": t_mega * 1e6, "mega_spread_pct": s_mega,
        "mega_x_realtime": frame_time / t_mega,
        "xla_x_realtime": frame_time / t_xla,
    }

    # ---- roofline accounting (docs/SCALING.md vocoder section) ----
    # model FLOPs/frame from XLA's own cost analysis of the scanned step;
    # pipeline HBM traffic/frame = the inter-segment boundary activations
    # (weights are VMEM-resident per segment; caches flush per dispatch)
    try:
        nfl = 64
        zfl = jax.device_put(
            rng.standard_normal((nfl, z_rows, 64)).astype(np.float32))
        an = run_xla.lower(voc.init_cache(1), zfl).compile().cost_analysis()
        flops_frame = float(an["flops"]) / nfl if an.get("flops") else None
    except Exception:
        flops_frame = None
    segio = mega_run.segments_io
    boundary_bytes = 0
    for a, b in zip(segio[:-1], segio[1:]):
        rows = a["out_rows"] * max(a["out_len"], 1) * a["out_lanes"] * 4
        boundary_bytes += 2 * rows  # write by seg k, read by seg k+1
    io_bytes = (z_rows * 64 + chunk) * 4  # codes in + audio out
    result["roofline"] = {
        "flops_per_frame": flops_frame,
        "achieved_tflops_mega": (flops_frame / t_mega / 1e12
                                 if flops_frame else None),
        "mfu_pct_v5e_bf16": (100 * flops_frame / t_mega / 394e12
                             if flops_frame else None),
        "boundary_hbm_bytes_frame": int(boundary_bytes),
        "io_hbm_bytes_frame": int(io_bytes),
        "hbm_gb_s": (boundary_bytes + io_bytes) / t_mega / 1e9,
        "per_segment": [
            {"name": s["name"],
             "weight_mb": round(s["weight_bytes"] / 2**20, 2),
             "cache_kb": round(s["cache_bytes"] / 1024, 1),
             "out_rows_lanes": (s["out_rows"], s["out_lanes"],
                                s["out_len"])}
            for s in segio],
    }

    # ---- full chain: symAD PQC mega encoder -> wire codes -> vocoder ----
    if not args.skip_chain:
        from dl_speech_enhancement_tpu.models import AudioDecGenerator
        from dl_speech_enhancement_tpu.ops.mega_kernel import make_mega_stream

        codec = AudioDecGenerator(use_pqc=True)
        codec_params, vq_state = codec.init(jax.random.PRNGKey(0))
        enc_init, enc_run = make_mega_stream(
            codec, codec_params, chunk=chunk, vq_state=vq_state)
        rx_init, rx_run = make_mega_vocoder(
            voc, params, chunk, weight_dtype=wd, vq_embed=vq_state.embed,
            seg_budget_bytes=args.budget)

        @jax.jit
        def run_chain(enc_cache, rx_cache, frames):
            _, _, codes = enc_run(enc_cache, frames)
            out, _ = rx_run(rx_cache, codes)
            return jnp.sum(jnp.square(out)) + jnp.sum(codes)

        def fit_chain_once(n_hi, trials=3):
            n1, n2 = n_hi // 4, n_hi

            def timed(n):
                frames = jax.device_put(
                    rng.standard_normal((n, chunk)).astype(np.float32))
                _ = float(run_chain(enc_init(), rx_init(), frames))
                best = float("inf")
                for _ in range(trials):
                    t0 = time.perf_counter()
                    _ = float(run_chain(enc_init(), rx_init(), frames))
                    best = min(best, time.perf_counter() - t0)
                return best

            return (timed(n2) - timed(n1)) / (n2 - n1)

        t_chain, s_chain = median_spread(
            [fit_chain_once(args.n_frames) for _ in range(args.fits)])
        result.update({
            "chain_us_frame": t_chain * 1e6, "chain_spread_pct": s_chain,
            "chain_x_realtime": frame_time / t_chain,
        })

    print(json.dumps(result))


if __name__ == "__main__":
    main()
