#!/usr/bin/env python3
"""End-to-end demo: train the 48 kHz denoiser on real audio, score with DNSMOS.

Uses the reference checkout's demo clips (6 clean + 6 noise wavs) as a tiny
corpus: trains the full-size without-PQC denoiser with the course loop
(mel + SNR loss, on-the-fly mixing) for a few hundred steps on the TPU,
then compares DNSMOS(SIG/BAK/OVRL) of noisy vs denoised on a held-out mix.

This intentionally overfits a 6-clip corpus — it demonstrates the complete
train -> checkpoint -> stream-infer -> score pipeline on real data, not a
production model.

Run: python tools/demo_e2e.py [--steps 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIPS = "/root/reference/notebook_files"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--out", default="/tmp/demo_e2e")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from dl_speech_enhancement_tpu.data import load_audio, write_wav, add_noise
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.losses import (
        MultiMelSpectrogramLoss, signal_noise_ratio,
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    from dl_speech_enhancement_tpu.eval.dnsmos import ComputeScore

    sr = 48000
    seg = 48000  # 1 s crops
    rng = np.random.default_rng(0)

    cleans = [load_audio(f"{CLIPS}/clean{i}.wav", sr)[:, :1] for i in range(1, 7)]
    noises = [load_audio(f"{CLIPS}/noise{i}.wav", sr)[:, :1] for i in range(1, 7)]
    print(f"corpus: {len(cleans)} clean / {len(noises)} noise clips", flush=True)

    def sample_batch(b=4):
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
            mixed = add_noise(cc, nn, rng.integers(10, 20))
            xs.append(mixed)
            ys.append(cc)
        return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)

    gen = AudioDecGenerator(use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(0))
    mel = MultiMelSpectrogramLoss(fs=sr, fft_sizes=[2048], hop_sizes=[300],
                                  win_lengths=[None], num_mels=80, fmin=0,
                                  fmax=24000, log_base=None)
    opt = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, noisy, clean):
        def loss_fn(p):
            y, *_ = gen(p, None, noisy, train=True)
            return (45.0 * mel(y, clean)
                    + (1.0 - jax.nn.sigmoid(signal_noise_ratio(y, clean)))
                    + 10.0 * jnp.mean(jnp.abs(y - clean)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for i in range(args.steps):
        noisy, clean = sample_batch()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(noisy), jnp.asarray(clean))
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.3f} ({time.time()-t0:.0f}s)",
                  flush=True)

    # held-out eval: clip 6 mixed at 15 dB(ref formula)
    c = cleans[5][: len(noises[5])]
    n = noises[5][: len(c)]
    t = (min(len(c), len(n)) // gen.hop) * gen.hop
    mixed = add_noise(c[:t], n[:t], 15).astype(np.float32)

    @jax.jit
    def infer(x):
        y, *_ = gen(params, None, x, train=False)
        return y

    den = np.asarray(infer(jnp.asarray(mixed[None])))[0]
    os.makedirs(args.out, exist_ok=True)
    write_wav(f"{args.out}/noisy.wav", mixed[:, 0], sr)
    write_wav(f"{args.out}/denoised.wav", den[:, 0], sr)
    write_wav(f"{args.out}/clean.wav", c[:t, 0], sr)

    cs = ComputeScore()
    for name in ("noisy", "denoised", "clean"):
        s = cs(f"{args.out}/{name}.wav")
        print(f"DNSMOS {name:9s}: SIG {s['SIG']:.2f} BAK {s['BAK']:.2f} "
              f"OVRL {s['OVRL']:.2f} P808 {s['P808_MOS']:.2f}", flush=True)


if __name__ == "__main__":
    main()
