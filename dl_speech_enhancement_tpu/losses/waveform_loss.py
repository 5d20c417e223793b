"""Waveform shape (max-pooled envelope) loss.

Reference losses/waveform_loss.py:15-75: L1 between non-overlapping max-pool
envelopes of |y| at several window lengths (torch MaxPool1d(winlen) uses
stride == kernel size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maxpool_envelope(y, winlen):
    """y: (B, T, C) -> (B, T//winlen, C) non-overlapping max of |y|."""
    a = jnp.abs(y)
    t = (a.shape[1] // winlen) * winlen
    a = a[:, :t]
    return jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, winlen, 1), (1, winlen, 1), "VALID"
    )


class WaveformShapeLoss:
    def __init__(self, winlen: int):
        self.winlen = winlen

    def __call__(self, y_hat, y):
        return jnp.mean(
            jnp.abs(_maxpool_envelope(y_hat, self.winlen) - _maxpool_envelope(y, self.winlen))
        )


class MultiWindowShapeLoss:
    def __init__(self, winlen=(300, 200, 100)):
        self.losses = [WaveformShapeLoss(w) for w in winlen]

    def __call__(self, y_hat, y):
        loss = 0.0
        for f in self.losses:
            loss = loss + f(y_hat, y)
        return loss / len(self.losses)
