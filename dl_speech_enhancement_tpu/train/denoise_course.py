"""The course training loop — GAN speech-enhancement fine-tuning.

Functional re-design of the reference's primary entry point
(train_denoise.py): without-PQC AudioDec generator + HiFiGAN discriminator,
on-the-fly SNR mixing at random SNR in [10, 20) dB, noise dropout with decay,
epoch-gated discriminator enabling, per-epoch validation and checkpoints.

Generator loss (train_denoise.py:138-154):
    lambda_mel * MultiMel + lambda_snr * (1 - sigmoid(SNR))
    [+ lambda_adv * gen_adv(D(pred)) + lambda_feat_match * feat_match]

Deviation (documented): the reference computes its adversarial term on the
raw *waveform* instead of the discriminator logits
(``criterion['gen_adv'](pred)``, train_denoise.py:147) — an apparent slip;
we feed the discriminator outputs, which is both the intent and what the
reference's own ``trainer/`` stack does (trainerGAN.py:244-246). Noise
dropout is applied *before* mixing (the intended semantics; see
data/mixing.py docstring).

TPU design: two precompiled jitted steps (with/without discriminator) carry
{params, opt states} through donated buffers; mixing happens host-side in
numpy while the device crunches the previous batch (prefetch pipeline).
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dl_speech_enhancement_tpu.losses import (
    MultiMelSpectrogramLoss,
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    signal_noise_ratio,
)
from dl_speech_enhancement_tpu.train.optim import build_optimizer
from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from dl_speech_enhancement_tpu.data.mixing import add_noise, noise_dropout

logger = logging.getLogger(__name__)


def make_course_steps(gen, disc, config, opt_g, opt_d):
    mel_loss = MultiMelSpectrogramLoss(**config["mel_loss_params"])
    gen_adv = GeneratorAdversarialLoss(**config.get("generator_adv_loss_params", {}))
    dis_adv = DiscriminatorAdversarialLoss(**config.get("discriminator_adv_loss_params", {}))
    feat_match = FeatureMatchLoss()
    l_mel = config["lambda_mel_loss"]
    l_snr = config.get("lambda_snr_loss", 0.0)
    l_adv = config.get("lambda_adv", 1.0)
    l_fm = config.get("lambda_feat_match", 2.0)
    # reference-compat mode: train_denoise.py:147 feeds the raw *waveform*
    # to gen_adv instead of the discriminator logits (the documented slip in
    # the module docstring). Off by default — used by the training-dynamics
    # parity tests and for bit-faithful reproduction runs.
    compat_adv = config.get("compat_adv_on_waveform", False)
    # EXTENSION (no reference analogue, default off): a waveform-domain L1
    # term. The reference objective (train_denoise.py:138-154) carries no
    # loss with a usable waveform-fidelity gradient — mel L1 is
    # magnitude-only and the 1-sigmoid(SNR) gate's gradient vanishes once
    # SNR saturates — so the learned solution is free to drift in
    # phase/time (measured: SI-SDR ~= -18 dB while DNSMOS improves; see
    # docs/QUALITY_r03.md). lambda_wave_l1 > 0 pins the waveform itself.
    l_wl1 = float(config.get("lambda_wave_l1", 0.0))
    # memory/recompute trade for large-batch adversarial steps: compute each
    # sub-discriminator's adv + feature-matching contribution under
    # jax.checkpoint so only ONE sub-D's feature list is live at a time
    # (MSD scale-0 features at 48 kHz batch-64 are ~1.5 GB each). Identical
    # losses/grads — the sums below reproduce the nested-list losses'
    # averaging exactly. Opt in via `discriminator_remat: true`; requires a
    # discriminator exposing num_subs/apply_sub (HiFiGANDiscriminator).
    remat_disc = (config.get("discriminator_remat", False)
                  and hasattr(disc, "apply_sub"))
    # EXTENSION (opt-in, default f32): run every discriminator pass in
    # bfloat16 — params and waveform inputs cast at the call boundary,
    # loss arithmetic back in f32. The adversarial step is ~89%
    # discriminator work (docs/SCALING.md round-5 training profile), and
    # the D zoo's cost is feature-map bytes + padded grouped-conv lanes,
    # both halved by bf16. Changes training numerics (GAN trajectories
    # diverge chaotically under ANY perturbation — see the precision
    # probe table) so it is config-gated: `discriminator_dtype: bf16`.
    d_dtype = {"float32": None, "bf16": jnp.bfloat16,
               "bfloat16": jnp.bfloat16}[
        str(config.get("discriminator_dtype", "float32"))]

    def _disc_apply(params_d, wav):
        if d_dtype is None:
            return disc(params_d, wav)
        pd16 = jax.tree_util.tree_map(lambda a: a.astype(d_dtype), params_d)
        outs = disc(pd16, wav.astype(d_dtype))
        return jax.tree_util.tree_map(
            lambda f: f.astype(jnp.float32), outs)
    # gradient accumulation: split each batch into `grad_accum` equal
    # microbatches, lax.scan the loss+grad over them and apply ONE optimizer
    # update on the averaged gradients — grows the effective batch past the
    # HBM activation wall (B=64 with remat on one v5e chip) at constant
    # memory. Mel/adversarial/feature-matching losses are batch means, so
    # their averaged microbatch grads equal the full-batch grads exactly.
    # The SNR gate term (1 - sigmoid of the BATCH-GLOBAL SNR,
    # train_denoise.py:140) is nonlinear in batch statistics and is instead
    # evaluated per microbatch and averaged — as faithful to the reference
    # (whose SNR is computed at whatever batch size it runs) and within
    # ~1e-4 relative of the full-batch value at these loss scales.
    grad_accum = int(config.get("grad_accum", 1))

    def _disc_apply_sub(params_d, i, wav):
        if d_dtype is None:
            return disc.apply_sub(params_d, i, wav)
        pd16 = jax.tree_util.tree_map(lambda a: a.astype(d_dtype), params_d)
        outs = disc.apply_sub(pd16, i, wav.astype(d_dtype))
        return jax.tree_util.tree_map(
            lambda f: f.astype(jnp.float32), outs)

    def _adv_fm_remat(params_d, y, target):
        adv_terms, fm_terms = [], []
        for i in range(disc.num_subs):
            def one(y_, t_, pd, i=i):
                q_ = _disc_apply_sub(pd, i, y_)
                q = _disc_apply_sub(pd, i, t_)
                # single-element nested lists: the losses' per-discriminator
                # averaging divides by 1, yielding the raw contribution
                return gen_adv([q_]), feat_match([q_], [q])
            a, f = jax.checkpoint(one)(y, target, params_d)
            adv_terms.append(a)
            fm_terms.append(f)
        n = disc.num_subs
        adv = sum(adv_terms) / (n if gen_adv.average else 1)
        fm = sum(fm_terms) / (n if feat_match.average_by_discriminators else 1)
        return adv, fm

    def _gen_loss(params_g, params_d, x, target, *, use_disc):
        y, *_ = gen(params_g, None, x, train=True)
        mel = l_mel * mel_loss(y, target)
        snr = l_snr * (1.0 - jax.nn.sigmoid(signal_noise_ratio(y, target)))
        total = mel + snr
        frags = {"mel_loss": mel, "snr_loss": snr}
        if l_wl1 > 0.0:
            wl1 = l_wl1 * jnp.mean(jnp.abs(y - target))
            total = total + wl1
            frags["wave_l1_loss"] = wl1
        if use_disc:
            if remat_disc and not compat_adv:
                adv, fm = _adv_fm_remat(params_d, y, target)
                adv = l_adv * adv
                fm = l_fm * fm
            else:
                p_ = _disc_apply(params_d, y)
                p = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                           _disc_apply(params_d, target))
                adv = l_adv * gen_adv(y if compat_adv else p_)
                fm = l_fm * feat_match(p_, p)
            total = total + adv + fm
            frags.update(adv_loss=adv, feat_loss=fm)
        return total, frags

    def _dis_loss(params_d, y, target):
        if remat_disc:
            terms = []
            for i in range(disc.num_subs):
                def one(pd, y_, t_, i=i):
                    q = _disc_apply_sub(pd, i, t_)
                    q_ = _disc_apply_sub(pd, i, y_)
                    r, f = dis_adv([q_], [q])
                    return r + f
                terms.append(jax.checkpoint(one)(params_d, y, target))
            n = disc.num_subs
            return l_adv * (sum(terms) / (n if dis_adv.average else 1))
        p = _disc_apply(params_d, target)
        p_ = _disc_apply(params_d, y)
        real, fake = dis_adv(p_, p)
        return l_adv * (real + fake)

    def _microbatches(x, target):
        if x.shape[0] % grad_accum:
            raise ValueError(
                f"batch size {x.shape[0]} is not divisible by "
                f"grad_accum={grad_accum}"
            )
        mb = x.shape[0] // grad_accum
        return (x.reshape(grad_accum, mb, *x.shape[1:]),
                target.reshape(grad_accum, mb, *target.shape[1:]))

    def _gen_grads(params_g, params_d, x, target, *, use_disc):
        """(g_loss, frags), grads — microbatch-accumulated when grad_accum>1."""
        vg = jax.value_and_grad(_gen_loss, has_aux=True)
        if grad_accum == 1:
            return vg(params_g, params_d, x, target, use_disc=use_disc)
        xs, ts = _microbatches(x, target)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda p, d, a, b: vg(p, d, a, b, use_disc=use_disc),
                           params_g, params_d, xs[0], ts[0]),
        )

        def body(acc, xt):
            out = vg(params_g, params_d, xt[0], xt[1], use_disc=use_disc)
            return jax.tree_util.tree_map(jnp.add, acc, out), None

        total, _ = jax.lax.scan(body, zeros, (xs, ts))
        return jax.tree_util.tree_map(lambda t: t / grad_accum, total)

    def _dis_grads(params_d, params_g_new, x, target):
        """(d_loss, grads) on the re-forwarded updated generator."""
        vg = jax.value_and_grad(_dis_loss)

        def one(x_, t_):
            # re-forward with the *updated* generator, no grad
            # (train_denoise.py:246-251)
            y2, *_ = gen(params_g_new, None, x_, train=False)
            return vg(params_d, jax.lax.stop_gradient(y2), t_)

        if grad_accum == 1:
            return one(x, target)
        xs, ts = _microbatches(x, target)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(one, xs[0], ts[0]),
        )

        def body(acc, xt):
            return jax.tree_util.tree_map(jnp.add, acc, one(xt[0], xt[1])), None

        total, _ = jax.lax.scan(body, zeros, (xs, ts))
        return jax.tree_util.tree_map(lambda t: t / grad_accum, total)

    def _make_step(use_disc: bool):
        def step(state, x, target):
            (g_loss, frags), grads = _gen_grads(
                state["params_generator"], state.get("params_discriminator"),
                x, target, use_disc=use_disc,
            )
            updates, new_opt_g = opt_g.update(
                grads, state["opt_generator"], state["params_generator"]
            )
            new_params_g = optax.apply_updates(state["params_generator"], updates)
            new_state = dict(state)
            new_state["params_generator"] = new_params_g
            new_state["opt_generator"] = new_opt_g
            d_loss = jnp.zeros(())
            if use_disc:
                d_loss, d_grads = _dis_grads(
                    state["params_discriminator"], new_params_g, x, target
                )
                d_updates, new_opt_d = opt_d.update(
                    d_grads, state["opt_discriminator"],
                    state["params_discriminator"],
                )
                new_state["params_discriminator"] = optax.apply_updates(
                    state["params_discriminator"], d_updates
                )
                new_state["opt_discriminator"] = new_opt_d
            # gradient statistics (train_denoise.py:189-210): the reference
            # reads .grad AFTER clip_grad_norm_, so report post-clip values
            # whenever clipping is configured (torch's clip factor)
            flat = jax.tree_util.tree_leaves(grads)
            clip = float(config.get("generator_grad_norm", -1))
            if clip > 0:
                gnorm = optax.global_norm(grads)
                factor = jnp.minimum(1.0, clip / (gnorm + 1e-6))
                flat = [g * factor for g in flat]
            gmax = jnp.max(jnp.asarray([jnp.max(g) for g in flat]))
            gmin = jnp.min(jnp.asarray([jnp.min(g) for g in flat]))
            gsum = sum(jnp.sum(jnp.abs(g)) for g in flat)
            gnum = sum(g.size for g in flat)
            stats = {"grad_max": gmax, "grad_min": gmin, "grad_avg": gsum / gnum}
            return new_state, g_loss, d_loss, frags, stats
        return jax.jit(step, donate_argnums=(0,))

    def _make_eval(use_disc: bool):
        def step(state, x, target):
            g_loss, frags = _gen_loss(
                state["params_generator"], state.get("params_discriminator"),
                x, target, use_disc=use_disc,
            )
            d_loss = jnp.zeros(())
            if use_disc:
                y, *_ = gen(state["params_generator"], None, x, train=False)
                d_loss = _dis_loss(state["params_discriminator"], y, target)
            return g_loss, d_loss, frags
        return jax.jit(step)

    return {
        "train": _make_step(False),
        "train_disc": _make_step(True),
        "eval": _make_eval(False),
        "eval_disc": _make_eval(True),
    }


def train_denoise_course(config: dict, gen, disc, train_loaders, val_loaders,
                         *, environment: str = "HPC", job_dir: str = "job_out",
                         task_name: str = "denoise", report=None, key=None,
                         initial_params=None):
    """Run the course loop. ``train_loaders``/``val_loaders`` are
    (clean_loader, noise_loader) pairs; ``report(category, series, value,
    iteration)`` is the scalar sink (ClearML/`tensorboard` adapter)."""
    key = key if key is not None else jax.random.PRNGKey(config.get("seed", 82))
    kg, kd = jax.random.split(key)
    params_g, _ = gen.init(kg)
    if initial_params is not None:
        params_g = initial_params
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", config["generator_optimizer_params"],
                            grad_norm=config.get("generator_grad_norm", -1))
    opt_d = build_optimizer("Adam", config["discriminator_optimizer_params"],
                            grad_norm=config.get("discriminator_grad_norm", -1))
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    steps_fns = make_course_steps(gen, disc, config, opt_g, opt_d)

    # data parallelism from the config (`parallel.data_devices`): state
    # replicated over the mesh, batches sharded; the jitted course steps
    # are unchanged (XLA partitions them SPMD)
    from dl_speech_enhancement_tpu.parallel.mesh import (
        mesh_from_config, shard_batch, shard_train_state,
    )

    mesh = mesh_from_config(config)
    if mesh is not None:
        state = shard_train_state(mesh, state)
        if config["batch_size"] % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {config['batch_size']} is not divisible by "
                f"parallel.data_devices={mesh.shape['data']}"
            )

    def _put(a):
        # host arrays go straight to the mesh sharding (one transfer per
        # shard), not via the default device
        return shard_batch(mesh, a) if mesh is not None else jnp.asarray(a)

    mix_rng = np.random.default_rng(config.get("seed", 82))
    noise_dropout_rate = config["noise_dropout_rate"]
    epochs = config["epochs"]
    epoch_disc = config["epoch_to_enable_discriminator"]
    epoch_ndo_decay = config["epoch_to_enable_noise_dropout_decay"]
    discriminator_enabled = False
    steps = config.get("step", 0)
    start_time = time.perf_counter()

    def _report(category, series, value, iteration):
        if report is not None:
            report(category, series, float(value), iteration)

    history = []
    for epoch in range(epochs):
        if disc is not None and epoch == epoch_disc:
            discriminator_enabled = True
        if epoch > epoch_ndo_decay:
            noise_dropout_rate -= config["noise_dropout_rate_decay"]

        logger.info("Epoch %d", epoch)
        train_losses = {"generator": [], "discriminator": []}
        last_frags = {}
        # note: mixing happens on host (numpy), so batches stay host-side
        # here; the jitted step's arguments upload while the previous step
        # computes (async dispatch) — prefetch_to_device is used by the
        # framework trainers whose batches go straight to device.
        for i_batch, (clean_batch, noise_batch) in enumerate(
            zip(train_loaders[0], train_loaders[1])
        ):
            if environment == "LAPTOP" and i_batch == 3:
                break
            if noise_dropout_rate > 0.0:
                noise_batch = noise_dropout(clean_batch, noise_batch,
                                            noise_dropout_rate, mix_rng)
            mixed = add_noise(clean_batch, noise_batch,
                              mix_rng.integers(10, 20))
            fn = steps_fns["train_disc" if discriminator_enabled else "train"]
            state, g_loss, d_loss, frags, gstats = fn(
                state, _put(mixed), _put(clean_batch)
            )
            steps += 1
            last_frags = frags
            g_loss, d_loss = float(g_loss), float(d_loss)
            train_losses["generator"].append(g_loss)
            train_losses["discriminator"].append(d_loss)
            if steps % 100 == 0 or environment == "LAPTOP":
                dt = time.perf_counter() - start_time
                logger.info("Training: Step %d \t Time: %d:%02d:%02d", steps,
                            int(dt // 3600), int(dt // 60) % 60, int(dt) % 60)
                _report("Gradients", "Maximum", gstats["grad_max"], steps)
                _report("Gradients", "Minimum", gstats["grad_min"], steps)
                _report("Gradients", "Average (Abs)", gstats["grad_avg"], steps)
                _report("Generator Batch Loss", "Train", g_loss, steps)
                _report("Discriminator Batch Loss", "Train", d_loss, steps)
                for name, value in frags.items():
                    _report("Generator Batch Loss", name, value, steps)

        avg_gen = float(np.mean(train_losses["generator"])) if train_losses["generator"] else 0.0
        avg_dis = float(np.mean(train_losses["discriminator"])) if train_losses["discriminator"] else 0.0

        if environment != "LAPTOP":
            ckpt = os.path.join(job_dir, f"{task_name}checkpoint-{steps}")
            save_checkpoint(ckpt, {"params_generator": state["params_generator"]},
                            config=config)

        # validation
        gen_val = dis_val = 0.0
        n_val = 0
        for i_batch, (clean_batch, noise_batch) in enumerate(
            zip(val_loaders[0], val_loaders[1])
        ):
            if environment == "LAPTOP" and i_batch == 3:
                break
            mixed = add_noise(clean_batch, noise_batch, mix_rng.integers(10, 20))
            fn = steps_fns["eval_disc" if discriminator_enabled else "eval"]
            g_loss, d_loss, _ = fn(state, _put(mixed), _put(clean_batch))
            gen_val += float(g_loss)
            dis_val += float(d_loss)
            n_val += 1
        if n_val == 0:
            logger.warning(
                "validation yielded no batches (corpus too small for the "
                "15%% split at batch_size=%s) — val losses report 0",
                config.get("batch_size"),
            )
        n_val = max(n_val, 1)
        _report("Generator Loss", "Train", avg_gen, epoch)
        _report("Generator Loss", "Validation", gen_val / n_val, epoch)
        _report("Discriminator Loss", "Train", avg_dis, epoch)
        _report("Discriminator Loss", "Validation", dis_val / n_val, epoch)
        history.append({
            "epoch": epoch, "train_gen": avg_gen, "train_dis": avg_dis,
            "val_gen": gen_val / n_val, "val_dis": dis_val / n_val,
            # last train step's loss fragments (mel/snr/adv/feat/wave_l1)
            "frags": {k: float(v) for k, v in last_frags.items()},
        })
    return state, history
