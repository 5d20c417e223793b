"""Statistic workload — analyzer code statistics for vocoder input norm.

The reference's ``codecStatistic.py`` driver is gitignored upstream; its
contract survives in config/statistic/*.yaml (analyzer checkpoint + ``stats``
output path) and in the consumer (models/vocoder/HiFiGAN.py:206-219, which
loads a ``(2, code_dim)`` npy of [mean; scale]). This module computes those
statistics: run the frozen analyzer (encode -> project -> quantize) over a
clean corpus and accumulate per-dimension mean / std of ``zq``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def compute_statistics(analyzer, analyzer_params, vq_state, dataset,
                       batch_length: int | None = None) -> np.ndarray:
    """Returns (2, code_dim) float32 [mean; scale(std)] of quantized codes."""

    @jax.jit
    def encode(x):
        e = analyzer.encoder(analyzer_params["encoder"], x)
        z = analyzer.projector(analyzer_params["projector"], e)
        zq, _ = analyzer.quantizer.inference(vq_state, z)
        return zq

    total = None
    total_sq = None
    count = 0
    for item in dataset:
        audio = item[1] if isinstance(item, tuple) else item
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[:, None]
        if batch_length is not None:
            t = (x.shape[0] // batch_length) * batch_length
            if t == 0:
                continue
            x = x[:t]
        t = (x.shape[0] // analyzer.hop) * analyzer.hop
        if t == 0:
            continue
        # bucket the clip length to a power-of-two frame count: the jitted
        # encode would otherwise recompile for nearly every distinct clip
        # length. The encoder is causal, so right zero-padding leaves the
        # first ``frames_true`` codes exact — padded frames are sliced off
        # before accumulation (they never touch the statistics).
        frames_true = t // analyzer.hop
        t_pad = (1 << (frames_true - 1).bit_length()) * analyzer.hop
        xp = np.zeros((1, t_pad, x.shape[1]), np.float32)
        xp[0, :t] = x[:t]
        zq = np.asarray(encode(jnp.asarray(xp)))[:, :frames_true]
        zq = zq.reshape(-1, zq.shape[-1]).astype(np.float64)
        if total is None:
            total = zq.sum(axis=0)
            total_sq = (zq ** 2).sum(axis=0)
        else:
            total += zq.sum(axis=0)
            total_sq += (zq ** 2).sum(axis=0)
        count += zq.shape[0]
    assert count > 0, "no usable audio for statistics"
    mean = total / count
    var = total_sq / count - mean ** 2
    scale = np.sqrt(np.maximum(var, 1e-12))
    return np.stack([mean, scale]).astype(np.float32)


def save_statistics(path: str, stats: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, stats)
