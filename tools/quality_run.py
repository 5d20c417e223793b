#!/usr/bin/env python3
"""Sustained quality run: multi-hour GAN training on real audio + DNSMOS curve.

Scales tools/demo_e2e.py into the sustained quality evidence run
(reference quality loop: /root/reference/train_denoise.py:213-355):

- full-size without-PQC denoiser + HiFiGAN discriminator (the course setup),
  trained with the REAL course step functions (train/denoise_course.py::
  make_course_steps) — mel + SNR loss, adversarial + feature-matching once
  the discriminator gate opens;
- on-the-fly SNR mixing in [10, 20) dB over the reference demo corpus
  (6 clean + 6 noise clips, clip 6 held out), random 1 s crops; optional
  noise dropout (the report §3.2 augmentation, intended pre-mix semantics);
- every --eval-every steps the held-out material is scored with the
  in-repo DNSMOS plus SI-SDR (raw AND best-lag-aligned, eval/metrics.py::
  si_sdr_best_lag), SNR, and mel-L1 vs the clean reference; per-SNR and
  mean scores are appended to a JSONL curve.

  Round-3 protocol: the held-out clip (clip 6, 2.77 s) is far shorter
  than DNSMOS's 9.01 s design window, so each eval utterance is the
  CONCATENATION of clip 6 mixed with three rotations of noise 6 at the
  target SNR (~8.3 s — one full DNSMOS window; cuts the single-window
  variance and noise-alignment bias of the r02 protocol);
- the best checkpoint by mean OVRL is archived (course format: generator
  params only) along with its denoised wavs; the last mel-only-phase
  params are archived separately at the --disc-at boundary
  (checkpoint-melonly + melonly.json) as the adversarial-vs-mel-only
  control;
- crash/resume safe: full training state is saved to checkpoint-latest at
  every eval and --resume (or an existing checkpoint-latest + --auto-resume)
  continues from it;
- NaN watchdog: aborts loudly if any loss goes non-finite.

Run: python tools/quality_run.py --steps 40000 --disc-at 2000 --batch 16
"""

import argparse
import functools
import json
import os
import shutil
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
    parser.add_argument("--eval-snrs", default="10,15,20",
                        help="comma-separated SNRs (dB) for the held-out eval")
    parser.add_argument("--save-every", type=int, default=4,
                        help="evals between checkpoint-latest saves (the full "
                        "GAN state is ~1 GB and crosses the host tunnel)")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--remat", action="store_true",
                        help="per-block generator rematerialization")
    parser.add_argument("--disc-remat", action="store_true",
                        help="per-sub-discriminator checkpointed losses")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient accumulation microbatches")
    parser.add_argument("--g-ema", type=float, default=0.0,
                        help="exponential-moving-average decay over generator "
                        "params; evals and the best-checkpoint archive use "
                        "the EMA weights (0 = off). Standard GAN eval "
                        "smoothing — damps the per-eval DNSMOS swings the "
                        "raw adversarial params show on a tiny corpus.")
    parser.add_argument("--ndo", type=float, default=0.0,
                        help="initial noise-dropout rate (report §3.2)")
    parser.add_argument("--ndo-decay", type=float, default=0.0,
                        help="rate decrement applied every --ndo-decay-every")
    parser.add_argument("--ndo-decay-every", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--wave-l1", type=float, default=0.0,
                        help="EXTENSION lambda_wave_l1 (waveform L1 term; "
                        "0 = reference-faithful objective)")
    parser.add_argument("--resume", default=None,
                        help="checkpoint-latest dir to resume from")
    parser.add_argument("--auto-resume", action="store_true",
                        help="resume from <out>/checkpoint-latest if present")
    parser.add_argument("--init-from", default=None,
                        help="checkpoint dir holding params_generator to "
                        "warm-start from (fresh optimizers; for ablation "
                        "fine-tunes off an archived checkpoint)")
    parser.add_argument("--out", default="runs/quality_r03")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    curve_path = os.path.join(args.out, "curve.jsonl")
    eval_snrs = [int(s) for s in args.eval_snrs.split(",")]

    import jax

    # persist compiled executables across runs (smoke + resume + real run
    # share the ~100 s GAN-step compiles)
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import (
        load_audio, write_wav, add_noise, noise_dropout,
    )
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    from dl_speech_enhancement_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint,
    )
    from dl_speech_enhancement_tpu.losses.metrics import (
        scale_invariant_sdr, signal_noise_ratio,
    )
    from dl_speech_enhancement_tpu.eval.metrics import (
        si_sdr_best_lag, mel_l1, stoi,
    )
    from dl_speech_enhancement_tpu.eval.dnsmos import ComputeScore

    sr = 48000
    seg = 48000  # 1 s crops

    cleans = [load_audio(f"{CLIPS}/clean{i}.wav", sr)[:, :1] for i in range(1, 7)]
    noises = [load_audio(f"{CLIPS}/noise{i}.wav", sr)[:, :1] for i in range(1, 7)]
    print(f"corpus: {len(cleans)} clean / {len(noises)} noise clips", flush=True)

    def sample_batch(rng, b, ndo_rate):
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
            if ndo_rate > 0.0:
                nn = noise_dropout(cc[None], nn[None], ndo_rate, rng)[0]
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
        lambda_wave_l1=args.wave_l1,
    )
    gen = AudioDecGenerator(use_pqc=False, remat=args.remat)
    disc = HiFiGANDiscriminator()
    kg, kd = jax.random.split(jax.random.PRNGKey(args.seed))
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
    # generator weight EMA (eval-only; kept OUTSIDE the step-fn state so the
    # jitted train steps and their donation contract are untouched). A
    # distinct copy so donating the train state never invalidates EMA leaves.
    ema = jax.tree.map(jnp.array, params_g) if args.g_ema > 0 else None
    if ema is not None:
        d = args.g_ema

        @functools.partial(jax.jit, donate_argnums=(0,))
        def ema_update(e, p):
            return jax.tree.map(lambda a, b: d * a + (1.0 - d) * b, e, p)

    start_step = 0
    resume_path = args.resume
    latest_dir = os.path.join(args.out, "checkpoint-latest")
    if resume_path is None and args.auto_resume and os.path.isdir(latest_dir):
        resume_path = latest_dir
    if resume_path:
        meta_path = os.path.join(os.path.dirname(os.path.abspath(resume_path)),
                                 "latest-step.json")
        print(f"restoring from {resume_path} (~1 GB through the tunnel — "
              "can take >15 min when congested)", flush=True)
        # keep the logfile mtime fresh during the quiet restore so the
        # watchdog's stale timer cannot mistake a slow restore for a hang
        import threading
        _hb_stop = threading.Event()

        def _heartbeat():
            n = 0
            while not _hb_stop.wait(300):
                n += 5
                print(f"[restore] still loading ({n} min)", flush=True)

        _hb = threading.Thread(target=_heartbeat, daemon=True)
        _hb.start()
        like = dict(state, params_gema=ema) if ema is not None else state
        try:
            restored = load_checkpoint(resume_path, like=like)
        except Exception:
            if ema is None:
                raise
            # checkpoint predates --g-ema (no params_gema stored): restore
            # without it and seed the EMA from the restored generator
            restored = load_checkpoint(resume_path, like=state)
            restored = dict(
                restored,
                params_gema=jax.tree.map(jnp.array,
                                         restored["params_generator"]))
        if ema is not None:
            ema = restored.pop("params_gema")
        state = restored
        # free the fresh-init duplicates NOW: keeping `like`/params_g/params_d
        # alive holds a full second copy of the GAN state (~1 GB) on the chip,
        # which pushed the B=16 adversarial step's peak past HBM on resume
        del like, restored, params_g, params_d
        _hb_stop.set()
        with open(meta_path) as f:
            start_step = json.load(f)["step"]
        print(f"resumed from {resume_path} at step {start_step}", flush=True)
    elif args.init_from:
        restored = load_checkpoint(args.init_from,
                                   like={"params_generator": params_g})
        state["params_generator"] = restored["params_generator"]
        state["opt_generator"] = opt_g.init(state["params_generator"])
        if ema is not None:
            ema = jax.tree.map(jnp.array, state["params_generator"])
        del restored, params_g
        print(f"warm-started generator from {args.init_from}", flush=True)
    rng = np.random.default_rng(args.seed + start_step)
    steps_fns = make_course_steps(gen, disc, config, opt_g, opt_d)

    # held-out eval material (round-3 protocol): clip 6 is only 2.77 s but
    # DNSMOS scores 9.01 s windows, so the eval utterance at each SNR is
    # clip 6 mixed with THREE deterministic rotations of noise 6,
    # concatenated (~8.3 s = one full DNSMOS window)
    c6 = cleans[5][: len(noises[5])]
    n6 = noises[5][: len(c6)]
    t = (min(len(c6), len(n6)) // gen.hop) * gen.hop
    seg_clean = c6[:t]
    heldout_clean = np.concatenate([seg_clean] * 3)
    heldout_mixes = {
        snr: np.concatenate([
            add_noise(seg_clean, np.roll(n6[:t], -(k * t) // 3, axis=0), snr)
            for k in range(3)
        ]).astype(np.float32)
        for snr in eval_snrs
    }

    @jax.jit
    def infer(params, x):
        y, *_ = gen(params, None, x, train=False)
        return y

    scorer = ComputeScore()
    keys = ("SIG", "BAK", "OVRL", "P808_MOS")
    write_wav(f"{args.out}/clean.wav", heldout_clean[:, 0], sr)

    def score_wave(wave, path):
        write_wav(path, wave[:, 0], sr)
        s = scorer(path)
        return {k: round(float(s[k]), 4) for k in keys}

    def fidelity(wave):
        """Waveform/spectral fidelity of `wave` vs the clean reference.

        The battery is designed to separate three failure stories the raw
        SI-SDR number cannot: raw + best-lag-aligned SI-SDR (+ the lag) for
        "right waveform, shifted"; STOI/ESTOI (envelope-correlation,
        phase-robust) + mel-L1 for "phase-incoherent re-synthesis of the
        right speech"; SNR for plain residual level."""
        out = {}
        out["si_sdr"] = round(float(scale_invariant_sdr(
            wave[None, :, 0], heldout_clean[None, :, 0])), 3)
        aligned, lag = si_sdr_best_lag(wave[:, 0], heldout_clean[:, 0])
        out["si_sdr_aligned"] = round(aligned, 3)
        out["lag"] = lag
        out["snr"] = round(float(signal_noise_ratio(
            wave[:, 0], heldout_clean[:, 0])), 3)
        out["stoi"] = round(stoi(heldout_clean[:, 0], wave[:, 0], sr), 4)
        out["estoi"] = round(
            stoi(heldout_clean[:, 0], wave[:, 0], sr, extended=True), 4)
        out["mel_l1"] = round(float(mel_l1(
            wave[:, 0], heldout_clean[:, 0], sr,
            **{k: v for k, v in config["mel_loss_params"].items()
               if k != "fs"})), 4)
        return out

    MEAN_KEYS = keys + ("si_sdr", "si_sdr_aligned", "snr", "stoi", "estoi",
                        "mel_l1")

    def dnsmos_eval(params, step, dump=False):
        """Denoise the held-out utterance at each eval SNR; report per-SNR
        DNSMOS + fidelity vs clean, and the across-SNR mean of each."""
        per_snr, ovrls = {}, []
        mean = {k: 0.0 for k in MEAN_KEYS}
        for snr in eval_snrs:
            den = np.asarray(infer(params, jnp.asarray(heldout_mixes[snr][None])))[0]
            path = (f"{args.out}/denoised_step{step}_snr{snr}.wav" if dump
                    else f"{args.out}/denoised_latest_snr{snr}.wav")
            s = score_wave(den, path)
            s.update(fidelity(den))
            per_snr[str(snr)] = s
            ovrls.append(s["OVRL"])
            for k in mean:
                mean[k] += s[k] / len(eval_snrs)
        return {"per_snr": per_snr,
                "mean": {k: round(v, 4) for k, v in mean.items()}}

    # identity-passthrough control: the unprocessed noisy input scored with
    # the same battery (sanity: si_sdr == input SNR ballpark, lag == 0,
    # aligned == raw)
    ref_scores = {"clean": score_wave(heldout_clean, f"{args.out}/clean.wav")}
    for snr in eval_snrs:
        s = score_wave(heldout_mixes[snr], f"{args.out}/noisy_snr{snr}.wav")
        s.update(fidelity(heldout_mixes[snr]))
        ref_scores[f"noisy_{snr}dB"] = s
        print(f"DNSMOS noisy@{snr}dB: {s}", flush=True)
    print(f"DNSMOS clean: {ref_scores['clean']}", flush=True)
    if start_step == 0:
        with open(curve_path, "w") as f:
            f.write(json.dumps({"step": -1, **ref_scores}) + "\n")

    t0 = time.time()
    best_ovrl = -1.0
    if start_step and os.path.exists(f"{args.out}/best.json"):
        with open(f"{args.out}/best.json") as f:
            best_ovrl = json.load(f)["mean_ovrl"]
    # crawl detector: the long-run axon client degrades by slowing down
    # (observed 2026-08-20: 0.73 -> 5 s/step with RSS 34 -> 62 GB over
    # ~5k steps), which never trips the watchdog's silence threshold. Track
    # per-step walls (eval steps excluded); once this process has its own
    # healthy baseline, a sustained 4x slowdown exits loudly so
    # run_watchdog.sh relaunches a fresh process from checkpoint-latest.
    import collections
    step_walls = collections.deque(maxlen=200)
    crawl_baseline = None
    last_t = None
    for i in range(start_step, args.steps):
        # pure function of the step index so a resumed run trains each step
        # at exactly the rate an uninterrupted run would (a stateful
        # decrement double-counted the decay when start_step landed on a
        # decay boundary)
        ndo_rate = max(args.ndo
                       - args.ndo_decay * (i // args.ndo_decay_every), 0.0)
        noisy, clean = sample_batch(rng, args.batch, ndo_rate)
        use_disc = i >= args.disc_at
        fn = steps_fns["train_disc" if use_disc else "train"]
        state, g_loss, d_loss, frags, gstats = fn(
            state, jnp.asarray(noisy), jnp.asarray(clean))
        if ema is not None:
            ema = ema_update(ema, state["params_generator"])
        # fetch (= fence) every 5 steps: bounds the donated-step queue depth
        # on the tunneled backend (deep queues of donated GAN steps have
        # wedged it — see tools/train_bench.py; a cadence-10 run with the
        # EMA chain wedged mid-fetch at step ~4510 on 2026-08-20) at <2%
        # throughput cost
        if i % 5 == 0 or i == args.steps - 1:
            g, d = float(g_loss), float(d_loss)
            if ema is not None:
                # fence the (donated) EMA dispatch chain at the same
                # cadence — its values are otherwise never fetched until
                # the next eval, and deep donated queues wedge the
                # tunneled backend (CLAUDE.md)
                float(jnp.sum(jax.tree_util.tree_leaves(ema)[0]))
            if not (np.isfinite(g) and np.isfinite(d)):
                print(f"FATAL: non-finite loss at step {i}: g={g} d={d}",
                      flush=True)
                sys.exit(1)
            print(f"step {i}: g_loss {g:.3f} d_loss {d:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        now = time.time()
        if last_t is not None and (i % args.eval_every) not in (0, 1):
            step_walls.append(now - last_t)
        last_t = now
        if len(step_walls) == step_walls.maxlen:
            med = sorted(step_walls)[len(step_walls) // 2]
            if crawl_baseline is None:
                crawl_baseline = med
                print(f"step-wall baseline {med:.2f}s", flush=True)
            elif med > 4.0 * crawl_baseline:
                print(f"CRAWL: median step wall {med:.2f}s > 4x baseline "
                      f"{crawl_baseline:.2f}s — checkpointing and exiting "
                      "for a fresh relaunch (watchdog resumes from "
                      "checkpoint-latest)", flush=True)
                save_checkpoint(
                    latest_dir,
                    dict(state, params_gema=ema) if ema is not None
                    else state, config=config)
                with open(os.path.join(args.out, "latest-step.json"),
                          "w") as f:
                    json.dump({"step": i + 1}, f)
                sys.exit(3)
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            dump = ((i + 1) % (4 * args.eval_every) == 0
                    or i == args.steps - 1)
            eval_params = ema if ema is not None else state["params_generator"]
            scores = dnsmos_eval(eval_params, i + 1, dump=dump)
            rec = {"step": i + 1, "g_loss": round(float(g_loss), 4),
                   "d_loss": round(float(d_loss), 4),
                   "disc_enabled": use_disc, "ndo_rate": round(ndo_rate, 4),
                   "wall_s": round(time.time() - t0, 1), **scores}
            with open(curve_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"EVAL {rec}", flush=True)
            if i + 1 == args.disc_at:
                # archive the last mel-only-phase generator as the
                # adversarial-vs-mel-only control (fires when --disc-at is
                # a multiple of --eval-every)
                save_checkpoint(os.path.join(args.out, "checkpoint-melonly"),
                                {"params_generator": eval_params})
                with open(f"{args.out}/melonly.json", "w") as f:
                    json.dump({"step": i + 1, **scores}, f, indent=1)
                for snr in eval_snrs:
                    shutil.copyfile(
                        f"{args.out}/denoised_step{i+1}_snr{snr}.wav"
                        if dump else
                        f"{args.out}/denoised_latest_snr{snr}.wav",
                        f"{args.out}/denoised_melonly_snr{snr}.wav")
                print(f"MELONLY archived at step {i+1}", flush=True)
            n_eval = (i + 1) // args.eval_every
            if n_eval % args.save_every == 0 or i == args.steps - 1:
                save_checkpoint(
                    latest_dir,
                    dict(state, params_gema=ema) if ema is not None else state,
                    config=config)
                with open(os.path.join(args.out, "latest-step.json"),
                          "w") as f:
                    json.dump({"step": i + 1}, f)
            if scores["mean"]["OVRL"] > best_ovrl:
                best_ovrl = scores["mean"]["OVRL"]
                save_checkpoint(os.path.join(args.out, "checkpoint-best"),
                                {"params_generator": eval_params})
                with open(f"{args.out}/best.json", "w") as f:
                    json.dump({"step": i + 1, "mean_ovrl": best_ovrl,
                               **scores}, f, indent=1)
                for snr in eval_snrs:  # the eval already wrote these wavs
                    shutil.copyfile(
                        f"{args.out}/denoised_step{i+1}_snr{snr}.wav"
                        if dump else
                        f"{args.out}/denoised_latest_snr{snr}.wav",
                        f"{args.out}/denoised_best_snr{snr}.wav")
                print(f"BEST mean OVRL {best_ovrl:.3f} at step {i+1}",
                      flush=True)

    final = {"params_generator": state["params_generator"],
             "params_discriminator": state["params_discriminator"]}
    if ema is not None:
        final["params_gema"] = ema
    save_checkpoint(os.path.join(args.out, f"checkpoint-{args.steps}"),
                    final, config=config)
    print(f"done in {time.time()-t0:.0f}s; artifacts in {args.out}", flush=True)


if __name__ == "__main__":
    main()
