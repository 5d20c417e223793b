"""Denoise fine-tune workload — encoder-only training on (noisy, clean) pairs.

Reference trainer/denoise.py:19-111: quantizer and decoder are frozen at
init, the codebook EMA is forced off every step (denoise.py:60), and the
loss is VQ (commitment, gradients flow to encoder/projector) + metric losses
between the denoised output and the clean target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.train.criterion import (
    build_criterion, metric_loss,
)
from dl_speech_enhancement_tpu.train.gan_trainer import TrainerGAN
from dl_speech_enhancement_tpu.train.optim import (
    build_optimizer_from_config, apply_updates_with_freeze, zero_frozen_grads,
)

FROZEN = ("decoder",)  # quantizer state is separate; EMA off => frozen


def make_denoise_steps(gen, config, opt_g):
    crit = build_criterion(config)
    lambda_vq = config.get("lambda_vq_loss", 1.0)

    def _loss(params_g, vq_state, x_n, x_c):
        # codebook EMA off (train=False): reference denoise.py:60
        y_nc, zq, z, vqloss, ppl, _ = gen(params_g, vq_state, x_n, train=False)
        vq_l = jnp.sum(vqloss) * lambda_vq
        metric_l, frags = metric_loss(crit, config, y_nc, x_c)
        total = vq_l + metric_l
        frags = dict(frags, vqloss=vq_l, generator_loss=total)
        return total, (frags, ppl)

    def train_step(state, x_n, x_c):
        (loss, (frags, ppl)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state["params_generator"], state["vq_state"], x_n, x_c
        )
        grads = zero_frozen_grads(grads, FROZEN)
        updates, new_opt = opt_g.update(
            grads, state["opt_generator"], state["params_generator"]
        )
        new_params = apply_updates_with_freeze(
            state["params_generator"], updates, FROZEN
        )
        new_state = dict(state)
        new_state["params_generator"] = new_params
        new_state["opt_generator"] = new_opt
        return new_state, frags, ppl

    def eval_step(state, x_n, x_c):
        _, (frags, ppl) = _loss(state["params_generator"], state["vq_state"],
                                x_n, x_c)
        return frags, ppl

    return {
        "train": jax.jit(train_step, donate_argnums=(0,)),
        "eval": jax.jit(eval_step),
    }


class Trainer(TrainerGAN):
    """Denoise fine-tuner (drop-in for trainer/denoise.py)."""

    def __init__(self, steps, epochs, data_loader, gen, config, key=None,
                 initial_state=None):
        super().__init__(steps, epochs, data_loader, config)
        self.gen = gen
        if initial_state is not None:
            params_g, vq_state = initial_state
        else:
            params_g, vq_state = gen.init(
                jax.random.PRNGKey(config.get("seed", 0)) if key is None else key
            )
        self.opt_g = build_optimizer_from_config(config, "generator")
        self.state = {
            "params_generator": params_g,
            "vq_state": vq_state,
            "opt_generator": self.opt_g.init(params_g),
        }
        self._shard_state()
        self._steps_fns = make_denoise_steps(gen, config, self.opt_g)

    def _train_step(self, batch):
        x_n, x_c = self._device_batch(tuple(batch))
        self.state, frags, ppl = self._steps_fns["train"](
            self.state, x_n, x_c
        )
        self._record_losses(frags, "train")
        self.steps += 1
        self._check_train_finish()

    def _eval_step(self, batch):
        x_n, x_c = self._device_batch(tuple(batch))
        frags, ppl = self._steps_fns["eval"](
            self.state, x_n, x_c
        )
        self._record_losses(frags, "eval")
