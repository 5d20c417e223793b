"""STFT front-end, numerically matched to ``torch.stft(center=True)``.

The whole loss stack of the reference depends on torch's STFT conventions
(reference: losses/stft_loss.py:33, losses/mel_loss.py:88), so this module
reproduces them exactly:

- reflect-pad the signal by ``n_fft // 2`` on both sides (center=True),
- slide windows of ``n_fft`` samples with the given hop,
- apply a periodic Hann window of ``win_length`` zero-padded symmetrically
  to ``n_fft``,
- one-sided real FFT.

TPU notes: framing is expressed as a gather with a static index matrix so XLA
lowers it to an efficient dynamic-slice fusion; the FFT runs as a batched
``rfft`` over the frame axis (frames become the sublane dimension). Everything
is shape-static and jit/scan friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _padded_window(window: jax.Array, n_fft: int) -> jax.Array:
    """Zero-pad a window symmetrically to n_fft (torch.stft convention)."""
    win_length = window.shape[-1]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice ``x (..., T)`` into overlapping frames ``(..., n_frames, frame_length)``.

    Uses a static gather index matrix — XLA:TPU turns this into strided loads.
    """
    t = x.shape[-1]
    n_frames = (t - frame_length) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "pad_mode")
)
def stft(
    x: jax.Array,
    window: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of ``x (..., T)`` -> ``(..., n_frames, n_fft//2+1)``.

    Matches ``torch.stft(x, n_fft, hop, win_length, window, center=True,
    return_complex=True)`` up to the frame/freq axis order (torch returns
    (..., freq, frames); we keep frames first — the time axis as sublanes).
    """
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
            mode=pad_mode,
        )
    frames = frame_signal(x, n_fft, hop)
    w = _padded_window(window, n_fft).astype(frames.dtype)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def stft_magnitude(
    x: jax.Array,
    window: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    eps: float = 1e-7,
) -> jax.Array:
    """Magnitude spectrogram ``sqrt(clamp(|STFT|^2, eps))``.

    Mirrors ``stft()`` in reference losses/stft_loss.py:19-35 (eps=1e-7) and
    the amplitude step of losses/mel_loss.py:88-90 (eps=1e-10): the clamp is
    applied to the *power* before the square root.
    """
    z = stft(x, window, n_fft=n_fft, hop=hop, win_length=win_length, center=center)
    power = jnp.square(z.real) + jnp.square(z.imag)
    return jnp.sqrt(jnp.clip(power, min=eps))


def spectrogram(
    x: jax.Array,
    window: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int,
    pad: int = 0,
    power: float = 1.0,
    eps: float = 1e-9,
) -> jax.Array:
    """torchaudio-style spectrogram used by the UnivNet spectral discriminator.

    Reference models/vocoder/modules/discriminator.py:556-565 calls
    ``torchaudio.functional.spectrogram(pad=win_length//2, power=1)``: the
    signal is first zero-padded by ``pad`` on both sides, then a centered
    (reflect-padded) STFT is taken. Returns (..., n_frames, n_freq).

    ``eps`` floors the power before the square root: the zero-padded frames
    have exactly zero power, where sqrt's gradient is infinite — adversarial
    training through this front-end would NaN (amplitude floor 3e-5 is far
    below audio noise floors).
    """
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    z = stft(x, window, n_fft=n_fft, hop=hop, win_length=win_length, center=True)
    mag = jnp.sqrt(jnp.clip(jnp.square(z.real) + jnp.square(z.imag), min=eps))
    if power == 1.0:
        return mag
    return jnp.power(mag, power)
