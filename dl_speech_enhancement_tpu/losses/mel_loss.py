"""Multi-resolution mel-spectrogram L1 loss.

Reference losses/mel_loss.py:97-155. Each resolution's front-end is a
precompiled :class:`~dl_speech_enhancement_tpu.dsp.mel.MelSpectrogram`; the
whole loss is a pure jittable function of (y_hat, y), so XLA fuses the two
mel pipelines and the L1 into one program.
"""

from __future__ import annotations

import jax.numpy as jnp

from dl_speech_enhancement_tpu.dsp.mel import MelSpectrogram


class MultiMelSpectrogramLoss:
    def __init__(
        self,
        fs: int = 22050,
        fft_sizes=(1024, 2048, 512),
        hop_sizes=(120, 240, 50),
        win_lengths=(600, 1200, 240),
        window: str = "hann_window",
        num_mels: int = 80,
        fmin=80,
        fmax=7600,
        center: bool = True,
        normalized: bool = False,
        onesided: bool = True,
        eps: float = 1e-10,
        log_base=10.0,
        backend: str = "auto",
    ):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        assert center and not normalized and onesided
        self.mels = [
            MelSpectrogram(
                fs=fs, fft_size=f, hop_size=h, win_length=w, window=window,
                num_mels=num_mels, fmin=fmin, fmax=fmax, eps=eps,
                log_base=log_base, backend=backend,
            )
            for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)
        ]

    def __call__(self, y_hat, y):
        """y_hat, y: (B, T, C) or (B, T) waveforms -> scalar loss."""
        loss = 0.0
        for mel in self.mels:
            loss = loss + jnp.mean(jnp.abs(mel(_flat(y_hat)) - mel(_flat(y))))
        return loss / len(self.mels)


def _flat(x):
    """(B, T, C) -> (B*C, T); (B, T) unchanged (mel_loss.py:84-86)."""
    if x.ndim == 3:
        return jnp.transpose(x, (0, 2, 1)).reshape(-1, x.shape[1])
    return x
