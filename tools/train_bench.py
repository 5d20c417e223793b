#!/usr/bin/env python3
"""Training-throughput benchmark: adversarial course GAN step on one chip.

Times the full course training step (generator update with mel + SNR +
adversarial + feature-matching losses, then the discriminator update on the
re-forwarded updated generator — train/denoise_course.py::make_course_steps,
mirroring /root/reference/train_denoise.py:213-263) on real hardware and
reports audio-seconds trained per wall second.

Reference anchor: the course trained ~9 h for 20 epochs on the DTU HPC GPU
(report section 4.1). One epoch there is ~61.6k clean files x ~1-10 s crops;
this prints the per-step device time so that anecdote can be compared at any
batch size.

Methodology: per-step wall time is measured with a value fetch (the axon
tunnel's `block_until_ready` is not a fence) and the tunnel's round-trip
(median trivial-fetch time) is subtracted. NOTE: keep the dispatch queue
depth at 1 (fetch every step) — queuing many donated-state GAN steps
without a fetch has been seen to wedge the tunneled backend.

Run: python tools/train_bench.py [--batch 4] [--seconds 1.0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--seconds", type=float, default=1.0,
                        help="crop length per sample, in seconds")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--remat", action="store_true",
                        help="per-block generator rematerialization")
    parser.add_argument("--disc-remat", action="store_true",
                        help="per-sub-discriminator checkpointed losses "
                             "(only one sub-D feature list live at a time)")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient accumulation: scan the step over "
                             "--accum microbatches of batch/--accum each")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    sr = 48000
    B = args.batch
    gen = AudioDecGenerator(use_pqc=False, remat=args.remat)
    seg = int(args.seconds * sr) // gen.hop * gen.hop

    # the course configuration (configs/denoise schema, reference lambdas)
    config = dict(
        mel_loss_params=dict(fs=sr, fft_sizes=[2048], hop_sizes=[300],
                             win_lengths=[None], num_mels=80, fmin=0,
                             fmax=24000, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
        discriminator_remat=args.disc_remat,
        grad_accum=args.accum,
    )
    disc = HiFiGANDiscriminator()
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    step = make_course_steps(gen, disc, config, opt_g, opt_d)["train_disc"]

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, seg, 1)).astype(np.float32) * 0.1)
    y = jax.device_put(rng.standard_normal((B, seg, 1)).astype(np.float32) * 0.1)
    state = {
        "params_generator": jax.device_put(params_g),
        "params_discriminator": jax.device_put(params_d),
        "opt_generator": jax.device_put(opt_g.init(params_g)),
        "opt_discriminator": jax.device_put(opt_d.init(params_d)),
    }

    t0 = time.perf_counter()
    state, g, d, _, _ = step(state, x, y)
    g0 = float(g)
    print(f"compile+first step {time.perf_counter() - t0:.1f} s, "
          f"g_loss {g0:.3f}", flush=True)

    # authoritative step FLOPs from XLA's own cost model (includes the
    # discriminator and any remat recompute); the second compile hits the
    # persistent cache so this is cheap
    step_flops = None
    try:
        an = step.lower(state, x, y).compile().cost_analysis()
        if an and an.get("flops"):
            step_flops = float(an["flops"])
    except Exception as e:  # cost model unavailable on some backends
        print(f"cost_analysis unavailable: {e}", flush=True)

    # tunnel round-trip estimate (subtracted from per-step walls)
    z = jax.device_put(jnp.zeros(()))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(z + 1.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    walls = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, g, d, _, _ = step(state, x, y)
        _ = float(g)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    dev = wall - rtt
    spread = (max(walls) - min(walls)) / wall * 100.0
    print(
        f"B={B} x {seg / sr:.2f}s adversarial course step: "
        f"wall {wall * 1e3:.1f} ms (rtt {rtt * 1e3:.1f} ms) -> device "
        f"~{dev * 1e3:.1f} ms/step = {B * seg / sr / dev:.1f} audio-s/s "
        f"trained, spread {spread:.0f}%",
        flush=True,
    )
    if step_flops:
        tflops = step_flops / dev / 1e12
        # v5e bf16 MXU peak (f32 inputs run through the same MXU at
        # reduced internal precision on this generation)
        mfu = 100.0 * tflops * 1e12 / 394e12
        print(f"XLA cost model: {step_flops / 1e12:.2f} TFLOP/step -> "
              f"{tflops:.1f} TFLOP/s achieved, MFU {mfu:.1f}% of v5e bf16 peak",
              flush=True)


if __name__ == "__main__":
    main()
