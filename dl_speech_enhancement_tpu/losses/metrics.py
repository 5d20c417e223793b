"""Audio quality metrics used as losses/measures by the course training loop.

Replaces the reference's torchmetrics dependency (train_denoise.py:15-21,
118-122): SignalNoiseRatio, ScaleInvariantSignalDistortionRatio, L1.
Semantics follow torchmetrics defaults (zero_mean=False for SNR), computed
over the whole batch like a torchmetrics functional call on stacked tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = jnp.finfo(jnp.float32).eps


def signal_noise_ratio(preds, target, zero_mean: bool = False):
    """SNR = 10 log10(||target||^2 / ||target - preds||^2), batch-global."""
    if zero_mean:
        target = target - jnp.mean(target)
        preds = preds - jnp.mean(preds)
    noise = target - preds
    return 10.0 * (
        jnp.log10(jnp.sum(jnp.square(target)) + _EPS)
        - jnp.log10(jnp.sum(jnp.square(noise)) + _EPS)
    )


def scale_invariant_sdr(preds, target):
    """SI-SDR with zero-mean normalization (torchmetrics semantics),
    averaged over the batch. preds/target: (B, T) or (B, T, C)."""
    p = preds.reshape(preds.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    p = p - jnp.mean(p, axis=1, keepdims=True)
    t = t - jnp.mean(t, axis=1, keepdims=True)
    alpha = (jnp.sum(p * t, axis=1, keepdims=True) + _EPS) / (
        jnp.sum(jnp.square(t), axis=1, keepdims=True) + _EPS
    )
    t_scaled = alpha * t
    e = p - t_scaled
    ratio = (jnp.sum(jnp.square(t_scaled), axis=1) + _EPS) / (
        jnp.sum(jnp.square(e), axis=1) + _EPS
    )
    return jnp.mean(10.0 * jnp.log10(ratio))


def mean_absolute_error(preds, target):
    return jnp.mean(jnp.abs(preds - target))
