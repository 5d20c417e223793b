"""Autoencoder (symAD codec) workload — the two-phase "efficient" paradigm.

Reference trainer/autoencoder.py:19-167:

- stage 1 (steps < ``start_steps.discriminator``): generator update with
  VQ loss + metric losses; EMA codebook training on.
- stage 2: encoder, projector and quantizer are frozen ("efficient"
  paradigm, autoencoder.py:62-79) and codebook EMA stops; the generator
  (decoder) additionally gets adversarial + feature-matching losses; the
  discriminator trains on a re-computed, stop-gradiented ``y_``
  (autoencoder.py:117-126 — "re-compute y_ which leads better quality").

Both stages are separate precompiled jitted steps selected by host-side step
count; all losses for a stage evaluate inside a single XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.train.criterion import (
    build_criterion, metric_loss, adv_loss, dis_loss,
)
from dl_speech_enhancement_tpu.train.gan_trainer import TrainerGAN
from dl_speech_enhancement_tpu.train.optim import (
    build_optimizer_from_config, apply_updates_with_freeze, zero_frozen_grads,
)

FROZEN_STAGE2 = ("encoder", "projector")


def make_autoencoder_steps(gen, disc, config, opt_g, opt_d):
    """Build the jitted stage-1/stage-2 train steps + eval step."""
    crit = build_criterion(config)
    lambda_vq = config.get("lambda_vq_loss", 1.0)

    def _gen_forward(params_g, vq_state, x, train_vq):
        y, zq, z, vqloss, ppl, new_vq = gen(params_g, vq_state, x, train=train_vq)
        return y, vqloss, ppl, new_vq

    def _gen_loss(params_g, vq_state, params_d, x, *, train_vq, use_adv):
        y, vqloss, ppl, new_vq = _gen_forward(params_g, vq_state, x, train_vq)
        vq_l = jnp.sum(vqloss) * lambda_vq
        metric_l, frags = metric_loss(crit, config, y, x)
        total = vq_l + metric_l
        frags = dict(frags, vqloss=vq_l)
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
        return total, (frags, ppl, new_vq)

    def _make_gen_step(train_vq: bool, use_adv: bool, frozen):
        def step(state, x):
            (loss, (frags, ppl, new_vq)), grads = jax.value_and_grad(
                _gen_loss, has_aux=True
            )(state["params_generator"], state["vq_state"],
              state["params_discriminator"], x,
              train_vq=train_vq, use_adv=use_adv)
            grads = zero_frozen_grads(grads, frozen)
            updates, new_opt = opt_g.update(
                grads, state["opt_generator"], state["params_generator"]
            )
            new_params = apply_updates_with_freeze(
                state["params_generator"], updates, frozen
            )
            new_state = dict(state)
            new_state["params_generator"] = new_params
            new_state["opt_generator"] = new_opt
            new_state["vq_state"] = new_vq
            return new_state, frags, ppl
        return jax.jit(step, donate_argnums=(0,))

    def _dis_step(state, x):
        y, *_ = gen(state["params_generator"], state["vq_state"], x, train=False)
        y = jax.lax.stop_gradient(y)

        def loss_fn(params_d):
            p = disc(params_d, x)
            p_ = disc(params_d, y)
            d_l, frags = dis_loss(crit, config, p_, p)
            return d_l, frags

        (d_l, frags), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params_discriminator"]
        )
        updates, new_opt = opt_d.update(
            grads, state["opt_discriminator"], state["params_discriminator"]
        )
        new_state = dict(state)
        new_state["params_discriminator"] = apply_updates_with_freeze(
            state["params_discriminator"], updates, ()
        )
        new_state["opt_discriminator"] = new_opt
        frags = dict(frags, discriminator_loss=d_l)
        return new_state, frags

    def _eval_step(state, x, use_adv: bool):
        y, zq, z, vqloss, ppl, _ = gen(
            state["params_generator"], state["vq_state"], x, train=False
        )
        vq_l = jnp.sum(vqloss) * lambda_vq
        metric_l, frags = metric_loss(crit, config, y, x)
        total = vq_l + metric_l
        frags = dict(frags, vqloss=vq_l)
        if use_adv:
            p_ = disc(state["params_discriminator"], y)
            p = disc(state["params_discriminator"], x)
            a_l, a_frags = adv_loss(crit, config, p_, p)
            total = total + a_l
            frags.update(a_frags)
            d_l, d_frags = dis_loss(crit, config, p_, p)
            frags.update(d_frags, discriminator_loss=d_l)
        frags["generator_loss"] = total
        return frags, ppl

    return {
        "gen_stage1": _make_gen_step(train_vq=True, use_adv=False, frozen=()),
        "gen_stage2": _make_gen_step(train_vq=False, use_adv=True,
                                     frozen=FROZEN_STAGE2),
        "dis": jax.jit(_dis_step, donate_argnums=(0,)),
        "eval_stage1": jax.jit(functools.partial(_eval_step, use_adv=False)),
        "eval_stage2": jax.jit(functools.partial(_eval_step, use_adv=True)),
    }


class Trainer(TrainerGAN):
    """symAD codec trainer (drop-in for trainer/autoencoder.py)."""

    def __init__(self, steps, epochs, data_loader, gen, disc, config, key):
        super().__init__(steps, epochs, data_loader, config)
        self.gen = gen
        self.disc = disc
        kg, kd = jax.random.split(jax.random.PRNGKey(config.get("seed", 0))
                                  if key is None else key)
        params_g, vq_state = gen.init(kg)
        params_d = disc.init(kd)
        self.opt_g = build_optimizer_from_config(config, "generator")
        self.opt_d = build_optimizer_from_config(config, "discriminator")
        self.state = {
            "params_generator": params_g,
            "params_discriminator": params_d,
            "vq_state": vq_state,
            "opt_generator": self.opt_g.init(params_g),
            "opt_discriminator": self.opt_d.init(params_d),
        }
        self._shard_state()
        self._steps_fns = make_autoencoder_steps(gen, disc, config,
                                                 self.opt_g, self.opt_d)
        start = config.get("start_steps", {})
        self.generator_start = start.get("generator", 0)
        self.discriminator_start = start.get("discriminator", 200000)

    def _train_step(self, batch):
        x = self._device_batch(batch)
        if self.steps >= self.generator_start:
            if self.steps < self.discriminator_start:
                self.state, frags, ppl = self._steps_fns["gen_stage1"](self.state, x)
            else:
                self.state, frags, ppl = self._steps_fns["gen_stage2"](self.state, x)
            self._record_losses(frags, "train")
            self._record_ppl(ppl, "train")
        if self.steps >= self.discriminator_start:
            self.state, dfrags = self._steps_fns["dis"](self.state, x)
            self._record_losses(dfrags, "train")
        self.steps += 1
        self._check_train_finish()

    def _eval_step(self, batch):
        x = self._device_batch(batch)
        fn = ("eval_stage2" if self.steps >= self.discriminator_start
              else "eval_stage1")
        frags, ppl = self._steps_fns[fn](self.state, x)
        self._record_losses(frags, "eval")
        self._record_ppl(ppl, "eval")

    def _record_ppl(self, ppl, mode):
        values = jax.device_get(ppl)
        self._record_losses(
            {f"ppl_{i}": v for i, v in enumerate(values)}, mode
        )
