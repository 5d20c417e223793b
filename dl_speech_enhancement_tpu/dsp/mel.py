"""Mel filterbank and log-mel spectrogram.

The reference builds its mel matrix with ``librosa.filters.mel`` (reference:
losses/mel_loss.py:54-61) — Slaney-style mel scale with Slaney area
normalization. librosa is not available here, so the filterbank is computed
from the published Slaney formulas in pure numpy at init time; on device it is
just a ``(n_freq, n_mels)`` matmul that XLA fuses with the preceding
magnitude computation and maps onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.dsp.stft import hann_window, stft_magnitude

# Slaney mel-scale constants (as used by librosa htk=False).
_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, ``(n_fft // 2 + 1, n_mels)``.

    Transposed relative to librosa's ``(n_mels, n_freq)`` so it can be used
    directly as ``amplitudes @ melmat`` (the reference stores the transpose
    for the same reason, losses/mel_loss.py:61).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(dtype)


def log_mel_spectrogram(
    x: jax.Array,
    window: jax.Array,
    melmat: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    eps: float = 1e-10,
    log_base: float | None = 10.0,
) -> jax.Array:
    """Log-mel spectrogram ``(..., n_frames, n_mels)``.

    Pipeline matches reference losses/mel_loss.py:74-94: STFT -> power ->
    clamped amplitude -> mel matmul -> clamp -> log (natural / log2 / log10).
    """
    amp = stft_magnitude(
        x, window, n_fft=n_fft, hop=hop, win_length=win_length, eps=eps
    )
    mel = jnp.clip(amp @ melmat.astype(amp.dtype), min=eps)
    if log_base is None:
        return jnp.log(mel)
    if log_base == 2.0:
        return jnp.log2(mel)
    if log_base == 10.0:
        return jnp.log10(mel)
    raise ValueError(f"log_base: {log_base} is not supported.")


class MelSpectrogram:
    """Configured log-mel front-end (the reference's MelSpectrogram module).

    Precomputes the window and mel matrix once; ``__call__`` is a pure jittable
    function of the waveform. Accepts (B, T) or (B, C, T) waveforms like the
    reference (losses/mel_loss.py:84-86 folds channels into the batch).
    """

    def __init__(
        self,
        fs: int = 22050,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: int | None = None,
        window: str = "hann_window",
        num_mels: int = 80,
        fmin: float | None = 80,
        fmax: float | None = 7600,
        eps: float = 1e-10,
        log_base: float | None = 10.0,
        backend: str = "auto",
    ):
        """``backend``: 'xla' (FFT pipeline, bit-matched to torch), 'pallas'
        (fused MXU DFT kernel, ops/mel_kernel.py — ~1.3x faster on v5e with
        <1% relative log-mel deviation), or 'auto' (pallas on TPU)."""
        if window != "hann_window":
            raise NotImplementedError(f"window: {window}")
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length if win_length is not None else fft_size
        self.eps = eps
        self.log_base = log_base
        self.window = hann_window(self.win_length)
        fmin = 0.0 if fmin is None else fmin
        fmax = fs / 2.0 if fmax is None else fmax
        self.melmat = jnp.asarray(
            mel_filterbank(fs, fft_size, num_mels, fmin=fmin, fmax=fmax)
        )
        if backend == "auto":
            backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        self.backend = backend
        self._fused = None
        if backend == "pallas":
            from dl_speech_enhancement_tpu.ops.mel_kernel import make_fused_log_mel
            self._fused = make_fused_log_mel(
                fs, fft_size, hop_size, self.win_length, num_mels,
                fmin=fmin, fmax=fmax, eps=eps, log_base=log_base,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 3:  # (B, C, T) -> (B*C, T)
            x = x.reshape(-1, x.shape[-1])
        if self._fused is not None:
            return self._fused(x)
        return log_mel_spectrogram(
            x,
            self.window,
            self.melmat,
            n_fft=self.fft_size,
            hop=self.hop_size,
            win_length=self.win_length,
            eps=self.eps,
            log_base=self.log_base,
        )
