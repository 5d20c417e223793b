"""Optimizers / schedulers / freeze masks, built from reference-schema config.

Maps the reference's torch optimizer+scheduler config keys
(config/*/:`generator_optimizer_type: Adam`, `generator_scheduler_type:
StepLR|MultiStepLR`, `*_grad_norm`) onto optax chains:

    clip_by_global_norm (if grad_norm > 0)
        -> add_decayed_weights (if weight_decay > 0; torch Adam's COUPLED
           L2, golden-tested against torch — not adamw's decoupled form)
        -> adam(lr=schedule)

Freezing (torch ``requires_grad=False``, trainer/autoencoder.py:66-75,
trainer/denoise.py:43-49) is functional: updates are applied, then frozen
subtrees are restored from the pre-update params — exact "no step" semantics
without restructuring the optimizer state at phase switches.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def build_schedule(lr: float, scheduler_type: str | None, params: dict | None):
    params = params or {}
    if scheduler_type in (None, "none"):
        return lr
    if scheduler_type == "StepLR":
        step_size = int(params.get("step_size", 1))
        gamma = float(params.get("gamma", 1.0))
        if gamma == 1.0:
            return lr
        return optax.exponential_decay(
            init_value=lr, transition_steps=step_size, decay_rate=gamma,
            staircase=True,
        )
    if scheduler_type == "MultiStepLR":
        gamma = float(params.get("gamma", 0.5))
        milestones = [int(m) for m in params.get("milestones", [])]
        return optax.piecewise_constant_schedule(
            init_value=lr, boundaries_and_scales={m: gamma for m in milestones}
        )
    raise NotImplementedError(f"scheduler {scheduler_type}")


def build_optimizer(optimizer_type: str, optimizer_params: dict,
                    scheduler_type: str | None = None,
                    scheduler_params: dict | None = None,
                    grad_norm: float = -1):
    """Returns an optax GradientTransformation."""
    if optimizer_type != "Adam":
        raise NotImplementedError(f"optimizer {optimizer_type}")
    lr = float(optimizer_params.get("lr", 1e-4))
    betas = optimizer_params.get("betas", (0.9, 0.999))
    wd = float(optimizer_params.get("weight_decay", 0.0))
    schedule = build_schedule(lr, scheduler_type, scheduler_params)
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(float(grad_norm)))
    if wd > 0.0:
        # torch Adam's weight_decay is COUPLED L2 (wd*theta added to the
        # gradient BEFORE the moment update, after clipping) — NOT adamw's
        # decoupled decay. add_decayed_weights before adam reproduces it.
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.adam(schedule, b1=betas[0], b2=betas[1]))
    return optax.chain(*chain)


def build_optimizer_from_config(config: dict, role: str):
    """role in {'generator', 'discriminator'} with reference config keys."""
    return build_optimizer(
        config.get(f"{role}_optimizer_type", "Adam"),
        config.get(f"{role}_optimizer_params", {}),
        config.get(f"{role}_scheduler_type"),
        config.get(f"{role}_scheduler_params"),
        config.get(f"{role}_grad_norm", -1),
    )


def apply_updates_with_freeze(params, updates, frozen: Sequence[str]):
    """optax.apply_updates, then restore top-level subtrees named in ``frozen``."""
    new_params = optax.apply_updates(params, updates)
    if not frozen:
        return new_params
    out = dict(new_params)
    for name in frozen:
        if name in params:
            out[name] = params[name]
    return out

def zero_frozen_grads(grads, frozen: Sequence[str]):
    """Zero gradients of frozen top-level subtrees BEFORE the optimizer.

    Matches torch ``requires_grad=False`` semantics where frozen params
    contribute no gradient at all — in particular ``clip_by_global_norm``
    must measure only the trainable parameters' norm
    (trainer/trainerGAN.py:271-279 clips over ``parameters()`` of which the
    frozen ones have ``grad=None``)."""
    if not frozen:
        return grads
    out = dict(grads)
    for name in frozen:
        if name in out:
            out[name] = jax.tree_util.tree_map(jnp.zeros_like, out[name])
    return out
