"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.ops.mel_kernel import make_fused_log_mel
from dl_speech_enhancement_tpu.dsp.mel import MelSpectrogram


def test_fused_log_mel_matches_xla_pipeline(rng):
    sr, n_fft, hop, n_mels = 48000, 512, 300, 80
    x = rng.standard_normal((2, 9600)).astype(np.float32) * 0.2
    fused = make_fused_log_mel(sr, n_fft, hop, None, n_mels, 0, 24000,
                               log_base=None, interpret=True)
    ref = MelSpectrogram(fs=sr, fft_size=n_fft, hop_size=hop, num_mels=n_mels,
                         fmin=0, fmax=24000, log_base=None, backend="xla")
    a = np.asarray(fused(jnp.asarray(x)))
    b = np.asarray(ref(jnp.asarray(x)))
    assert a.shape == b.shape
    # DFT-as-matmul in f32 vs FFT: tight in log-mel space
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_fused_log_mel_window_shorter_than_fft(rng):
    sr, n_fft, hop, win, n_mels = 24000, 512, 120, 240, 40
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    fused = make_fused_log_mel(sr, n_fft, hop, win, n_mels, 0, 12000,
                               log_base=10.0, interpret=True)
    ref = MelSpectrogram(fs=sr, fft_size=n_fft, hop_size=hop, win_length=win,
                         num_mels=n_mels, fmin=0, fmax=12000, log_base=10.0,
                         backend="xla")
    a = np.asarray(fused(jnp.asarray(x)))
    b = np.asarray(ref(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_fused_stft_magnitude_matches_xla(rng):
    from dl_speech_enhancement_tpu.ops import make_fused_stft_magnitude
    from dl_speech_enhancement_tpu.dsp.stft import hann_window, stft_magnitude
    import jax.numpy as jnp

    n_fft, hop, win = 512, 120, 240
    x = rng.standard_normal((2, 4800)).astype(np.float32)
    fused = make_fused_stft_magnitude(n_fft, hop, win, interpret=True)
    a = np.asarray(fused(jnp.asarray(x)))
    b = np.asarray(stft_magnitude(jnp.asarray(x), hann_window(win),
                                  n_fft=n_fft, hop=hop, win_length=win))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_fused_log_mel_gradient_matches_xla(rng):
    """The custom VJP must agree with autodiff through the XLA pipeline —
    training losses backprop through this kernel."""
    sr, n_fft, hop, n_mels = 48000, 512, 300, 80
    x = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32) * 0.2)
    fused = make_fused_log_mel(sr, n_fft, hop, None, n_mels, 0, 24000,
                               log_base=None, interpret=True)
    ref = MelSpectrogram(fs=sr, fft_size=n_fft, hop_size=hop, num_mels=n_mels,
                         fmin=0, fmax=24000, log_base=None, backend="xla")
    g_fused = jax.grad(lambda x: jnp.sum(jnp.sin(fused(x))))(x)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref(x))))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=5e-3, rtol=1e-2)


def test_fused_stft_magnitude_gradient(rng):
    from dl_speech_enhancement_tpu.ops import make_fused_stft_magnitude
    from dl_speech_enhancement_tpu.dsp.stft import hann_window, stft_magnitude

    n_fft, hop, win = 512, 120, 240
    x = jnp.asarray(rng.standard_normal((1, 2400)).astype(np.float32))
    fused = make_fused_stft_magnitude(n_fft, hop, win, interpret=True)
    win_arr = hann_window(win)
    ref = lambda x: stft_magnitude(x, win_arr, n_fft=n_fft, hop=hop, win_length=win)
    g_fused = jax.grad(lambda x: jnp.sum(jnp.tanh(fused(x))))(x)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.tanh(ref(x))))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-2)


def test_fused_log_mel_channels_layout(rng):
    """(B, C, T) inputs fold into the batch like the XLA path."""
    sr, n_fft, hop, n_mels = 48000, 512, 300, 80
    x = rng.standard_normal((2, 1, 4800)).astype(np.float32)
    fused = make_fused_log_mel(sr, n_fft, hop, None, n_mels, 0, 24000,
                               log_base=None, interpret=True)
    a = np.asarray(fused(jnp.asarray(x)))
    assert a.shape[0] == 2
