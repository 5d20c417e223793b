#!/usr/bin/env python3
"""Per-block timing ablation of the adversarial course training step.

VERDICT r4 #2: the B=16 x 1 s adversarial step measures 658 ms (5.6% MFU)
and no profile exists showing where it goes. This tool times a ladder of
jitted sub-programs on the chip (RTT-subtracted value-fenced walls, the
bench.py methodology) so the step wall decomposes into attributable parts:

  g_fwd            generator forward only
  mel_grad         mel+snr objective fwd+bwd w.r.t. the waveform
  gen_step_nodisc  full G step without discriminator (fwd+bwd+Adam)
  d_fwd            discriminator zoo forward (y and target)
  d_grad           discriminator loss fwd+bwd w.r.t. D params
  gen_step_disc    G phase with adv+FM (no D update)
  full_step        the shipped train_disc step (G phase + D phase)

plus optional variants (--variant) for candidate optimizations:

  remat64          B=64 + generator remat + discriminator remat
  bf16d            discriminator runs in bf16 (params + inputs)

Writes one JSON line per measurement to stdout; run on an idle chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rtt_subtracted(fn, fence, n=5):
    import jax

    _ = fence(fn())  # compile + settle
    _ = fence(fn())
    z = jax.device_put(np.float32(0.0))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(z + 1.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = fence(fn())
        walls.append(time.perf_counter() - t0)
    med = float(np.median(walls))
    spread = float((np.max(walls) - np.min(walls)) / med * 100.0)
    return med - rtt, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--variant", choices=["base", "remat64", "bf16d"],
                    default="base")
    ap.add_argument("--parts", default="all",
                    help="comma list of parts to run (default all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator,
        HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import (
        make_course_steps,
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    from dl_speech_enhancement_tpu.losses import (
        MultiMelSpectrogramLoss,
        DiscriminatorAdversarialLoss,
        signal_noise_ratio,
    )
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    B = args.batch
    remat = args.variant == "remat64"
    if remat and args.batch == 16:
        B = 64
    gen = AudioDecGenerator(use_pqc=False, remat=remat)
    seg = int(48000 * args.seconds) // gen.hop * gen.hop
    disc = HiFiGANDiscriminator()
    cfg = dict(
        mel_loss_params=dict(fs=48000, fft_sizes=[2048], hop_sizes=[300],
                             win_lengths=[None], num_mels=80, fmin=0,
                             fmax=24000, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
        discriminator_remat=remat,
        discriminator_dtype="bf16" if args.variant == "bf16d" else "float32",
    )
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    pg, _ = gen.init(kg)
    pd = disc.init(kd)
    og = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                         grad_norm=10.0)
    od = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                         grad_norm=10.0)
    steps = make_course_steps(gen, disc, cfg, og, od)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, seg, 1), ).astype(np.float32)
                       * 0.1)
    t = jax.device_put(rng.standard_normal((B, seg, 1)).astype(np.float32)
                       * 0.1)
    pg = jax.device_put(pg)
    pd = jax.device_put(pd)
    if args.variant == "bf16d":
        pd_run = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), pd)
    else:
        pd_run = pd

    mel_loss = MultiMelSpectrogramLoss(**cfg["mel_loss_params"])
    dis_adv = DiscriminatorAdversarialLoss(
        **cfg["discriminator_adv_loss_params"])

    out = {"variant": args.variant, "batch": B, "seg": seg}
    parts = (args.parts.split(",") if args.parts != "all" else
             ["g_fwd", "mel_grad", "d_fwd", "d_grad", "gen_step_nodisc",
              "full_step"])

    def audio_s(dev_s):
        return round(B * seg / 48000 / dev_s, 1)

    # ---- primitives ----
    if "g_fwd" in parts:
        # NB arrays ride as ARGUMENTS — jit-closures over device arrays
        # inline them as constants (CLAUDE.md: remote compile rejects big
        # bodies with HTTP 413, and XLA constant-folds the whole forward)
        @jax.jit
        def g_fwd(pg_, x_):
            y, *_ = gen(pg_, None, x_, train=True)
            return jnp.sum(jnp.square(y))

        dt, sp = rtt_subtracted(lambda: g_fwd(pg, x), float)
        out["g_fwd_ms"] = round(dt * 1e3, 1)
        print("g_fwd_ms", out["g_fwd_ms"], file=sys.stderr)

    if "mel_grad" in parts:
        @jax.jit
        def mel_grad(x_, t_):
            def obj(y):
                return (45.0 * mel_loss(y, t_)
                        + 1.0 - jax.nn.sigmoid(signal_noise_ratio(y, t_)))
            return jnp.sum(jnp.square(jax.grad(obj)(x_)))

        dt, sp = rtt_subtracted(lambda: mel_grad(x, t), float)
        out["mel_grad_ms"] = round(dt * 1e3, 1)
        print("mel_grad_ms", out["mel_grad_ms"], file=sys.stderr)

    act_dtype = jnp.bfloat16 if args.variant == "bf16d" else jnp.float32

    if "d_fwd" in parts:
        @jax.jit
        def d_fwd(pd_, x_, t_):
            py = disc(pd_, x_.astype(act_dtype))
            pt = disc(pd_, t_.astype(act_dtype))
            s = 0.0
            for sub in py + pt:
                s = s + jnp.sum(jnp.square(sub[-1].astype(jnp.float32)))
            return s

        dt, sp = rtt_subtracted(lambda: d_fwd(pd_run, x, t), float)
        out["d_fwd_ms"] = round(dt * 1e3, 1)
        print("d_fwd_ms", out["d_fwd_ms"], file=sys.stderr)

    if "d_grad" in parts:
        @jax.jit
        def d_grad(pd_, x_, t_):
            def obj(p):
                q = disc(p, t_)
                q_ = disc(p, x_)
                real, fake = dis_adv(q_, q)
                return real + fake
            g = jax.grad(obj)(pd_)
            return sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(g))

        dt, sp = rtt_subtracted(lambda: d_grad(pd, x, t), float)
        out["d_grad_ms"] = round(dt * 1e3, 1)
        print("d_grad_ms", out["d_grad_ms"], file=sys.stderr)

    # ---- composed steps (fresh state each call; state donated) ----
    def state_factory():
        # fresh device copies: the donated step consumes its inputs, so
        # reusing pg/pd across parts raises 'Array has been deleted'
        pg2 = jax.tree_util.tree_map(lambda a: a + 0.0, pg)
        pd2 = jax.tree_util.tree_map(lambda a: a + 0.0, pd)
        return {"params_generator": pg2,
                "params_discriminator": pd2,
                "opt_generator": jax.device_put(og.init(pg)),
                "opt_discriminator": jax.device_put(od.init(pd))}

    if "fence_probe" in parts:
        # Does fetching an EARLY output (the generator loss) fence the
        # whole dispatch on this backend, or only that buffer? Compare
        # walls fencing g vs fencing the last-written state (a D-phase
        # optimizer leaf + a G param leaf). If wall_state >> wall_g the
        # r2-r4 train legs under-measured the step.
        stepfn = steps["train_disc"]
        # use the original pg/pd directly (no defensive copies): this part
        # runs alone and the D-zoo step peak + duplicated 70M-param trees
        # exceed HBM (observed RESOURCE_EXHAUSTED)
        holder = {"st": {"params_generator": pg,
                         "params_discriminator": pd,
                         "opt_generator": jax.device_put(og.init(pg)),
                         "opt_discriminator": jax.device_put(od.init(pd))}}

        @jax.jit
        def _leafsum(a, b):
            return jnp.sum(a) + jnp.sum(b)

        def leaf_sum(st):
            # ONE fetch (one RTT): sum a D-phase optimizer leaf (written
            # last) and a G param leaf in a single tiny dispatch
            leaves = jax.tree_util.tree_leaves(st["opt_discriminator"])
            leaves2 = jax.tree_util.tree_leaves(st["params_generator"])
            return float(_leafsum(leaves[-1], leaves2[-1]))

        st, g, d, frags, stats = stepfn(holder["st"], x, t)
        del holder
        _ = leaf_sum(st)
        for fence_name in ("g", "d", "state"):
            walls = []
            for _i in range(6):
                st_in = st
                t0 = time.perf_counter()
                st, g, d, frags, stats = stepfn(st_in, x, t)
                if fence_name == "g":
                    _ = float(g)
                elif fence_name == "d":
                    _ = float(d)
                else:
                    _ = leaf_sum(st)
                walls.append(time.perf_counter() - t0)
            out[f"fence_{fence_name}_ms"] = round(
                float(np.median(walls)) * 1e3, 1)
            print(f"fence_{fence_name}_ms", out[f"fence_{fence_name}_ms"],
                  file=sys.stderr)
            # drain: fully fence before switching fence types
            _ = leaf_sum(st)

    for name, key in (("gen_step_nodisc", "train"),
                      ("full_step", "train_disc")):
        if name not in parts:
            continue
        stepfn = steps[key]
        holder = {"st": state_factory()}

        def call(stepfn=stepfn, holder=holder):
            st, g, d, frags, stats = stepfn(holder["st"], x, t)
            holder["st"] = st
            return g

        dt, sp = rtt_subtracted(call, float, n=6)
        out[f"{name}_ms"] = round(dt * 1e3, 1)
        out[f"{name}_audio_s_per_s"] = audio_s(dt)
        out[f"{name}_spread_pct"] = round(sp, 1)
        print(name, out[f"{name}_ms"], "ms", file=sys.stderr)
        del holder["st"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
