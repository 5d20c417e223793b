"""Vocoder workload — HiFiGAN/UnivNet generator on a frozen analyzer.

Reference trainer/vocoder.py:19-147: the analyzer (symAD encoder + projector
+ quantizer) is frozen; each step encodes the waveform to ``zq`` under
stop-gradient, the vocoder generator reconstructs the waveform, and metric /
adversarial losses drive generator + discriminator updates with the
"re-compute y_ for the discriminator" pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import functools

import optax

from dl_speech_enhancement_tpu.train.criterion import (
    build_criterion, metric_loss, adv_loss, dis_loss,
)
from dl_speech_enhancement_tpu.train.gan_trainer import TrainerGAN
from dl_speech_enhancement_tpu.train.optim import build_optimizer_from_config


def make_vocoder_steps(analyzer, gen, disc, config, opt_g, opt_d):
    crit = build_criterion(config)

    def _encode(analyzer_params, vq_state, x):
        e = analyzer.encoder(analyzer_params["encoder"], x)
        z = analyzer.projector(analyzer_params["projector"], e)
        zq, _ = analyzer.quantizer.inference(vq_state, z)
        return jax.lax.stop_gradient(zq)

    def _gen_loss(params_g, params_d, zq, x, *, use_adv):
        y = gen(params_g, zq)
        total, frags = metric_loss(crit, config, y, x)
        if use_adv:
            p_ = disc(params_d, y)
            if config.get("use_feat_match_loss", False):
                p = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, disc(params_d, x)
                )
            else:
                p = None
            a_l, a_frags = adv_loss(crit, config, p_, p)
            total = total + a_l
            frags.update(a_frags)
        frags["generator_loss"] = total
        return total, frags

    def _make_gen_step(use_adv: bool):
        def step(state, x):
            zq = _encode(state["params_analyzer"], state["vq_state"], x)
            (loss, frags), grads = jax.value_and_grad(_gen_loss, has_aux=True)(
                state["params_generator"], state["params_discriminator"],
                zq, x, use_adv=use_adv,
            )
            updates, new_opt = opt_g.update(
                grads, state["opt_generator"], state["params_generator"]
            )
            new_state = dict(state)
            new_state["params_generator"] = optax.apply_updates(
                state["params_generator"], updates
            )
            new_state["opt_generator"] = new_opt
            return new_state, frags
        return jax.jit(step, donate_argnums=(0,))

    def _dis_step(state, x):
        zq = _encode(state["params_analyzer"], state["vq_state"], x)
        y = jax.lax.stop_gradient(gen(state["params_generator"], zq))

        def loss_fn(params_d):
            p = disc(params_d, x)
            p_ = disc(params_d, y)
            return dis_loss(crit, config, p_, p)

        (d_l, frags), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params_discriminator"]
        )
        updates, new_opt = opt_d.update(
            grads, state["opt_discriminator"], state["params_discriminator"]
        )
        new_state = dict(state)
        new_state["params_discriminator"] = optax.apply_updates(
            state["params_discriminator"], updates
        )
        new_state["opt_discriminator"] = new_opt
        return new_state, dict(frags, discriminator_loss=d_l)

    def _eval_step(state, x, use_adv: bool):
        zq = _encode(state["params_analyzer"], state["vq_state"], x)
        y = gen(state["params_generator"], zq)
        total, frags = metric_loss(crit, config, y, x)
        if use_adv:
            p_ = disc(state["params_discriminator"], y)
            p = disc(state["params_discriminator"], x)
            a_l, a_frags = adv_loss(crit, config, p_, p)
            total = total + a_l
            frags.update(a_frags)
            d_l, d_frags = dis_loss(crit, config, p_, p)
            frags.update(d_frags, discriminator_loss=d_l)
        frags["generator_loss"] = total
        return frags

    return {
        "gen": _make_gen_step(use_adv=False),
        "gen_adv": _make_gen_step(use_adv=True),
        "dis": jax.jit(_dis_step, donate_argnums=(0,)),
        "eval": jax.jit(functools.partial(_eval_step, use_adv=False)),
        "eval_adv": jax.jit(functools.partial(_eval_step, use_adv=True)),
    }


class Trainer(TrainerGAN):
    """Vocoder trainer (drop-in for trainer/vocoder.py)."""

    def __init__(self, steps, epochs, data_loader, analyzer, analyzer_params,
                 vq_state, gen, disc, config, key=None):
        super().__init__(steps, epochs, data_loader, config)
        self.analyzer = analyzer
        kg, kd = jax.random.split(jax.random.PRNGKey(config.get("seed", 0))
                                  if key is None else key)
        params_g = gen.init(kg)
        params_d = disc.init(kd)
        self.opt_g = build_optimizer_from_config(config, "generator")
        self.opt_d = build_optimizer_from_config(config, "discriminator")
        self.state = {
            "params_analyzer": analyzer_params,
            "vq_state": vq_state,
            "params_generator": params_g,
            "params_discriminator": params_d,
            "opt_generator": self.opt_g.init(params_g),
            "opt_discriminator": self.opt_d.init(params_d),
        }
        self._shard_state()
        self._steps_fns = make_vocoder_steps(analyzer, gen, disc, config,
                                             self.opt_g, self.opt_d)
        self.generator_start = config.get("generator_train_start_steps", 0)
        self.discriminator_start = config.get("discriminator_train_start_steps", 0)

    def _train_step(self, batch):
        x = self._device_batch(batch)
        if self.steps > self.generator_start:
            fn = "gen_adv" if self.steps > self.discriminator_start else "gen"
            self.state, frags = self._steps_fns[fn](self.state, x)
            self._record_losses(frags, "train")
        if self.steps > self.discriminator_start:
            self.state, dfrags = self._steps_fns["dis"](self.state, x)
            self._record_losses(dfrags, "train")
        self.steps += 1
        self._check_train_finish()

    def _eval_step(self, batch):
        x = self._device_batch(batch)
        fn = "eval_adv" if self.steps > self.discriminator_start else "eval"
        frags = self._steps_fns[fn](self.state, x)
        self._record_losses(frags, "eval")
