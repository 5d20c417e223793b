#!/usr/bin/env python3
"""Sustained quality run: multi-hour GAN training on real audio + DNSMOS curve.

Scales tools/demo_e2e.py into the round-2 quality evidence run
(reference quality loop: /root/reference/train_denoise.py:213-355):

- full-size without-PQC denoiser + HiFiGAN discriminator (the course setup),
  trained with the REAL course step functions (train/denoise_course.py::
  make_course_steps) — mel + SNR loss, adversarial + feature-matching once
  the discriminator gate opens;
- on-the-fly SNR mixing in [10, 20) dB over the reference demo corpus
  (6 clean + 6 noise clips, clip 6 held out), random 1 s crops;
- every --eval-every steps: denoise the held-out mix, score DNSMOS
  (SIG/BAK/OVRL/P808), append to a JSONL curve, dump the wav;
- NaN watchdog: aborts loudly if any loss goes non-finite;
- checkpoints + final DNSMOS table archived under --out.

Run: python tools/quality_run.py --steps 20000 --disc-at 4000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIPS = "/root/reference/notebook_files"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20000)
    parser.add_argument("--disc-at", type=int, default=4000,
                        help="step at which the discriminator gate opens")
    parser.add_argument("--eval-every", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--remat", action="store_true",
                        help="per-block generator rematerialization")
    parser.add_argument("--disc-remat", action="store_true",
                        help="per-sub-discriminator checkpointed losses")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient accumulation microbatches")
    parser.add_argument("--out", default="/tmp/quality_r02")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    curve_path = os.path.join(args.out, "curve.jsonl")

    import jax
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import load_audio, write_wav, add_noise
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint
    from dl_speech_enhancement_tpu.eval.dnsmos import ComputeScore

    sr = 48000
    seg = 48000  # 1 s crops
    rng = np.random.default_rng(0)

    cleans = [load_audio(f"{CLIPS}/clean{i}.wav", sr)[:, :1] for i in range(1, 7)]
    noises = [load_audio(f"{CLIPS}/noise{i}.wav", sr)[:, :1] for i in range(1, 7)]
    print(f"corpus: {len(cleans)} clean / {len(noises)} noise clips", flush=True)

    def sample_batch(b):
        xs, ys = [], []
        for _ in range(b):
            c = cleans[rng.integers(0, 5)]  # clip 6 held out
            n = noises[rng.integers(0, 5)]
            cs = rng.integers(0, max(len(c) - seg, 1))
            ns = rng.integers(0, max(len(n) - seg, 1))
            cc = c[cs : cs + seg]
            nn = n[ns : ns + seg]
            if len(cc) < seg:
                cc = np.pad(cc, ((0, seg - len(cc)), (0, 0)))
            if len(nn) < seg:
                nn = np.pad(nn, ((0, seg - len(nn)), (0, 0)))
            xs.append(add_noise(cc, nn, rng.integers(10, 20)))
            ys.append(cc)
        return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)

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
    gen = AudioDecGenerator(use_pqc=False, remat=args.remat)
    disc = HiFiGANDiscriminator()
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    steps_fns = make_course_steps(gen, disc, config, opt_g, opt_d)

    # held-out eval clip: clip 6 mixed at 15 dB (reference formula)
    c6 = cleans[5][: len(noises[5])]
    n6 = noises[5][: len(c6)]
    t = (min(len(c6), len(n6)) // gen.hop) * gen.hop
    heldout_mixed = add_noise(c6[:t], n6[:t], 15).astype(np.float32)
    heldout_clean = c6[:t]

    @jax.jit
    def infer(params, x):
        y, *_ = gen(params, None, x, train=False)
        return y

    scorer = ComputeScore()
    write_wav(f"{args.out}/noisy.wav", heldout_mixed[:, 0], sr)
    write_wav(f"{args.out}/clean.wav", heldout_clean[:, 0], sr)

    def dnsmos_eval(params, step, dump=False):
        den = np.asarray(infer(params, jnp.asarray(heldout_mixed[None])))[0]
        path = f"{args.out}/denoised_step{step}.wav" if dump else f"{args.out}/denoised_latest.wav"
        write_wav(path, den[:, 0], sr)
        s = scorer(path)
        return {k: round(float(s[k]), 4) for k in ("SIG", "BAK", "OVRL", "P808_MOS")}

    ref_scores = {}
    for name, path in (("noisy", f"{args.out}/noisy.wav"),
                       ("clean", f"{args.out}/clean.wav")):
        s = scorer(path)
        ref_scores[name] = {k: round(float(s[k]), 4)
                            for k in ("SIG", "BAK", "OVRL", "P808_MOS")}
        print(f"DNSMOS {name}: {ref_scores[name]}", flush=True)
    with open(curve_path, "w") as f:
        f.write(json.dumps({"step": -1, **ref_scores}) + "\n")

    t0 = time.time()
    losses_g, losses_d = [], []
    for i in range(args.steps):
        noisy, clean = sample_batch(args.batch)
        use_disc = i >= args.disc_at
        fn = steps_fns["train_disc" if use_disc else "train"]
        state, g_loss, d_loss, frags, gstats = fn(
            state, jnp.asarray(noisy), jnp.asarray(clean))
        if i % 50 == 0 or i == args.steps - 1:
            g, d = float(g_loss), float(d_loss)
            if not (np.isfinite(g) and np.isfinite(d)):
                print(f"FATAL: non-finite loss at step {i}: g={g} d={d}",
                      flush=True)
                sys.exit(1)
            losses_g.append(g)
            losses_d.append(d)
            print(f"step {i}: g_loss {g:.3f} d_loss {d:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            scores = dnsmos_eval(state["params_generator"], i + 1,
                                 dump=((i + 1) % (4 * args.eval_every) == 0
                                       or i == args.steps - 1))
            rec = {"step": i + 1, "g_loss": round(float(g_loss), 4),
                   "d_loss": round(float(d_loss), 4),
                   "disc_enabled": use_disc,
                   "wall_s": round(time.time() - t0, 1), **scores}
            with open(curve_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"EVAL {rec}", flush=True)

    save_checkpoint(os.path.join(args.out, f"checkpoint-{args.steps}"),
                    {"params_generator": state["params_generator"],
                     "params_discriminator": state["params_discriminator"]},
                    config=config)
    print(f"done in {time.time()-t0:.0f}s; artifacts in {args.out}", flush=True)


if __name__ == "__main__":
    main()
