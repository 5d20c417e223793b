"""Golden tests: STFT / mel front-end vs torch.stft and known formulas."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dl_speech_enhancement_tpu.dsp import (
    hann_window,
    stft,
    stft_magnitude,
    spectrogram,
    mel_filterbank,
    MelSpectrogram,
)


@pytest.mark.parametrize(
    "n_fft,hop,win", [(1024, 120, 600), (2048, 300, 2048), (512, 50, 240)]
)
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal((2, 9600)).astype(np.float32)
    window = hann_window(win)
    ours = stft(jnp.asarray(x), window, n_fft=n_fft, hop=hop, win_length=win)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop,
        win,
        torch.hann_window(win),
        return_complex=True,
    )  # (B, F, frames)
    ref = ref.numpy().transpose(0, 2, 1)  # -> (B, frames, F)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-4)


def test_stft_magnitude_matches_reference_stft_fn(rng):
    # reference losses/stft_loss.py:19-35: sqrt(clamp(power, 1e-7))
    x = rng.standard_normal((3, 4800)).astype(np.float32)
    n_fft, hop, win = 1024, 120, 600
    window = hann_window(win)
    ours = stft_magnitude(jnp.asarray(x), window, n_fft=n_fft, hop=hop, win_length=win)
    z = torch.stft(
        torch.from_numpy(x), n_fft, hop, win, torch.hann_window(win), return_complex=True
    )
    power = z.real**2 + z.imag**2
    ref = torch.sqrt(torch.clamp(power, min=1e-7)).transpose(2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_hann_window_matches_torch():
    for n in (240, 600, 1200, 2048):
        np.testing.assert_allclose(
            np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6
        )


def test_mel_filterbank_properties():
    """Slaney filterbank invariants (librosa is unavailable for a direct diff)."""
    sr, n_fft, n_mels = 48000, 2048, 80
    fb = mel_filterbank(sr, n_fft, n_mels, fmin=0, fmax=24000)
    assert fb.shape == (n_fft // 2 + 1, n_mels)
    assert np.all(fb >= 0)
    # every filter has support and peaks at the expected slaney-normalized value
    from dl_speech_enhancement_tpu.dsp.mel import hz_to_mel, mel_to_hz

    mel_pts = np.linspace(hz_to_mel(0), hz_to_mel(24000), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    peak_expected = 2.0 / (hz_pts[2:] - hz_pts[:n_mels])
    peaks = fb.max(axis=0)
    # grid discretization makes the realised peak <= ideal peak
    assert np.all(peaks > 0)
    assert np.all(peaks <= peak_expected * 1.0001)
    ratio = peaks / peak_expected
    assert ratio.mean() > 0.9


def test_mel_scale_roundtrip():
    from dl_speech_enhancement_tpu.dsp.mel import hz_to_mel, mel_to_hz

    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 24000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10, atol=1e-6)
    # slaney: linear below 1 kHz with slope 3/200
    np.testing.assert_allclose(hz_to_mel(200.0), 3.0, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-12)


def test_mel_spectrogram_shapes_and_finite(rng):
    x = rng.standard_normal((2, 1, 9600)).astype(np.float32) * 0.1
    mel = MelSpectrogram(
        fs=48000, fft_size=2048, hop_size=300, win_length=None,
        num_mels=80, fmin=0, fmax=24000, log_base=None,
    )
    y = mel(jnp.asarray(x))
    assert y.shape == (2, 9600 // 300 + 1, 80)
    assert np.all(np.isfinite(np.asarray(y)))


def test_spectrogram_matches_torch_functional(rng):
    # parity with torchaudio.functional.spectrogram(pad=w//2, power=1):
    # constant pad, then centered reflect stft.
    x = rng.standard_normal((2, 4800)).astype(np.float32)
    n_fft, hop, win = 1024, 120, 600
    ours = spectrogram(
        jnp.asarray(x), hann_window(win), n_fft=n_fft, hop=hop,
        win_length=win, pad=win // 2, power=1.0,
    )
    xp = torch.nn.functional.pad(torch.from_numpy(x), (win // 2, win // 2))
    z = torch.stft(
        xp, n_fft, hop, win, torch.hann_window(win), return_complex=True
    )
    ref = z.abs().transpose(2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)
