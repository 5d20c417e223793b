"""Multi-resolution STFT loss (spectral convergence + log magnitude).

Reference losses/stft_loss.py:19-170.
"""

from __future__ import annotations

import jax.numpy as jnp

from dl_speech_enhancement_tpu.dsp.stft import hann_window, stft_magnitude


def spectral_convergence_loss(x_mag, y_mag):
    """||y - x||_F / ||y||_F (stft_loss.py:38-56)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_mag, y_mag):
    """L1 of log magnitudes (stft_loss.py:59-77)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


class STFTLoss:
    def __init__(self, fft_size=1024, hop_size=120, win_length=600,
                 window="hann_window", backend="auto"):
        """``backend``: 'xla' FFT pipeline, 'pallas' fused MXU DFT kernel
        (ops/mel_kernel.make_fused_stft_magnitude), 'auto' = pallas on TPU."""
        assert window == "hann_window"
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length
        self.window = hann_window(win_length)
        if backend == "auto":
            import jax
            backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        self._fused = None
        if backend == "pallas":
            from dl_speech_enhancement_tpu.ops.mel_kernel import (
                make_fused_stft_magnitude,
            )
            self._fused = make_fused_stft_magnitude(fft_size, hop_size, win_length)

    def _mag(self, x):
        if self._fused is not None:
            return self._fused(x)
        return stft_magnitude(x, self.window, n_fft=self.fft_size,
                              hop=self.hop_size, win_length=self.win_length)

    def __call__(self, x, y):
        """x, y: (B, T). Returns (sc_loss, mag_loss)."""
        x_mag = self._mag(x)
        y_mag = self._mag(y)
        return spectral_convergence_loss(x_mag, y_mag), log_stft_magnitude_loss(
            x_mag, y_mag
        )


class MultiResolutionSTFTLoss:
    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), window="hann_window",
                 backend="auto"):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        self.losses = [
            STFTLoss(f, h, w, window, backend=backend)
            for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)
        ]

    def __call__(self, x, y):
        """x, y: (B, T) or (B, T, C) (folded into batch). Returns (sc, mag)."""
        if x.ndim == 3:
            x = jnp.transpose(x, (0, 2, 1)).reshape(-1, x.shape[1])
            y = jnp.transpose(y, (0, 2, 1)).reshape(-1, y.shape[1])
        sc = mag = 0.0
        for f in self.losses:
            sc_l, mag_l = f(x, y)
            sc = sc + sc_l
            mag = mag + mag_l
        return sc / len(self.losses), mag / len(self.losses)
