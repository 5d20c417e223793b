#!/usr/bin/env python3
"""Bound the effect of TPU reduced-precision matmuls on a TRAINING trajectory.

The chip executes f32 convs/matmuls as bf16-ish MXU passes by default
(measured ~41 dB output deltas on inference, CLAUDE.md); the reference
trains in plain f32 (/root/reference/train_denoise.py:83-90). The
training-dynamics parity suite pins numerics on CPU f32 only — this tool
measures what the chip's internal precision does to an actual *training
trajectory* at flagship size, and whether
``jax.default_matmul_precision("highest")`` is warranted for training.

Protocol: N identical adversarial course steps (full-size without-PQC
generator + HiFiGAN discriminator, same PRNG init, same fixed real-audio
batches) are run under one (platform, precision) setting per invocation,
logging per-step g/d losses and a final parameter fingerprint
(per-top-level-subtree L2 norms). A --compare invocation reads two such
logs and reports per-step loss divergence and final-parameter relative
drift.

Run (chip default):   python tools/precision_probe.py --out /tmp/p_tpu.json
Run (chip highest):   python tools/precision_probe.py --precision highest \
                          --out /tmp/p_tpu_hi.json
Run (CPU f32 truth):  python tools/precision_probe.py --platform cpu \
                          --out /tmp/p_cpu.json
Compare:              python tools/precision_probe.py \
                          --compare /tmp/p_cpu.json /tmp/p_tpu.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIPS = "/root/reference/notebook_files"


def run(args):
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import load_audio, add_noise
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    if args.platform != "cpu":
        enable_compile_cache()

    sr = 48000
    gen = AudioDecGenerator(use_pqc=False)
    seg = int(args.seconds * sr) // gen.hop * gen.hop
    config = dict(
        mel_loss_params=dict(fs=sr, fft_sizes=[2048], hop_sizes=[300],
                             win_lengths=[None], num_mels=80, fmin=0,
                             fmax=24000, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
    )
    disc = HiFiGANDiscriminator()
    kg, kd = jax.random.split(jax.random.PRNGKey(args.seed))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                            grad_norm=10.0)
    steps = make_course_steps(gen, disc, config, opt_g, opt_d)
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }

    # deterministic real-audio batches (identical across invocations)
    cleans = [load_audio(f"{CLIPS}/clean{i}.wav", sr)[:, :1]
              for i in range(1, 6)]
    noises = [load_audio(f"{CLIPS}/noise{i}.wav", sr)[:, :1]
              for i in range(1, 6)]
    rng = np.random.default_rng(args.seed)
    batches = []
    for _ in range(args.steps):
        xs, ys = [], []
        for _ in range(args.batch):
            c = cleans[rng.integers(0, 5)]
            n = noises[rng.integers(0, 5)]
            cs = rng.integers(0, len(c) - seg)
            ns = rng.integers(0, len(n) - seg)
            cc, nn = c[cs:cs + seg], n[ns:ns + seg]
            xs.append(add_noise(cc, nn, rng.integers(10, 20)))
            ys.append(cc)
        batches.append((np.stack(xs).astype(np.float32),
                        np.stack(ys).astype(np.float32)))

    prec_ctx = (jax.default_matmul_precision("highest")
                if args.precision == "highest" else None)
    log = {"platform": args.platform, "precision": args.precision,
           "batch": args.batch, "seconds": args.seconds,
           "steps": args.steps, "seed": args.seed, "g": [], "d": []}
    t0 = time.time()
    import contextlib
    with prec_ctx if prec_ctx is not None else contextlib.nullcontext():
        fn = steps["train_disc"]
        for i, (x, y) in enumerate(batches):
            state, g, d, _, _ = fn(state, jnp.asarray(x), jnp.asarray(y))
            g, d = float(g), float(d)  # fetch = fence (queue depth 1)
            log["g"].append(g)
            log["d"].append(d)
            if i % 10 == 0:
                print(f"step {i}: g {g:.4f} d {d:.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
    # parameter fingerprint: L2 norm per top-level generator subtree
    fp = {}
    for k, sub in state["params_generator"].items():
        sq = sum(float(jnp.sum(jnp.square(l)))
                 for l in jax.tree_util.tree_leaves(sub))
        fp[k] = float(np.sqrt(sq))
    log["g_param_l2"] = fp
    log["wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(log, f, indent=1)
    print(f"wrote {args.out} ({log['wall_s']}s)", flush=True)


def compare(a_path, b_path):
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)
    assert a["steps"] == b["steps"] and a["seed"] == b["seed"]
    ga, gb = np.array(a["g"]), np.array(b["g"])
    da, db = np.array(a["d"]), np.array(b["d"])
    rel_g = np.abs(ga - gb) / np.maximum(np.abs(ga), 1e-9)
    rel_d = np.abs(da - db) / np.maximum(np.abs(da), 1e-9)
    fpa, fpb = a["g_param_l2"], b["g_param_l2"]
    fp_rel = {k: abs(fpa[k] - fpb[k]) / max(abs(fpa[k]), 1e-12)
              for k in fpa}
    out = {
        "a": {"platform": a["platform"], "precision": a["precision"]},
        "b": {"platform": b["platform"], "precision": b["precision"]},
        "steps": a["steps"],
        "g_rel_div_first_step": float(rel_g[0]),
        "g_rel_div_max": float(np.max(rel_g)),
        "g_rel_div_final": float(rel_g[-1]),
        "d_rel_div_max": float(np.max(rel_d)) if len(da) else None,
        "g_param_l2_rel_drift": {k: round(v, 6) for k, v in fp_rel.items()},
        "g_param_l2_rel_drift_max": float(max(fp_rel.values())),
    }
    print(json.dumps(out, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon", choices=["axon", "cpu"])
    ap.add_argument("--precision", default="default",
                    choices=["default", "highest"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/precision_probe.json")
    ap.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = ap.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        run(args)


if __name__ == "__main__":
    main()
