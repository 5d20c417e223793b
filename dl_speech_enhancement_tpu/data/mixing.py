"""On-the-fly noise mixing + noise dropout (the course augmentations).

- :func:`add_noise` keeps the reference's exact (nonstandard) formula
  (dataloader/data_utils.py:12-22): ``scale = exp(snr/10) * ||noise|| /
  ||speech||; mix = (scale*speech + noise) / 2`` — note it scales the
  *speech*, uses a natural-exponential "snr", and halves the mix. A standard
  ``mode="db"`` variant (10^(snr/20), scaling the noise) is provided for new
  experiments.
- :func:`noise_dropout` implements the *intended* semantics (report §3.2):
  per-sample, replace the noise clip with the clean clip **before** mixing
  with probability ``rate``. (The reference applies it after the mix was
  already computed, train_denoise.py:312-319, making it a no-op for that
  batch — documented quirk, deliberately fixed here.)
"""

from __future__ import annotations

import numpy as np


def add_noise(speech: np.ndarray, noise: np.ndarray, snr, mode: str = "reference"):
    assert speech.shape == noise.shape, "Shapes are not equal!"
    speech_power = np.linalg.norm(speech.reshape(-1))
    noise_power = np.linalg.norm(noise.reshape(-1))
    if mode == "reference":
        scale = np.exp(float(snr) / 10.0) * noise_power / max(speech_power, 1e-12)
        return (scale * speech + noise) / 2.0
    elif mode == "db":
        target = speech_power / (10.0 ** (float(snr) / 20.0))
        return speech + noise * (target / max(noise_power, 1e-12))
    raise ValueError(mode)


def noise_dropout(clean_batch: np.ndarray, noise_batch: np.ndarray,
                  rate: float, rng: np.random.Generator) -> np.ndarray:
    """Replace noise[i] with clean[i] with probability ``rate`` (pre-mix)."""
    if rate <= 0.0:
        return noise_batch
    out = noise_batch.copy()
    for i in range(len(out)):
        if rng.random() <= rate:
            out[i] = clean_batch[i]
    return out
