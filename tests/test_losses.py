"""Golden tests: loss stack vs torch re-derivations of the reference math."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dl_speech_enhancement_tpu.losses import (
    MultiMelSpectrogramLoss,
    MultiResolutionSTFTLoss,
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    MultiWindowShapeLoss,
    signal_noise_ratio,
    scale_invariant_sdr,
)
from dl_speech_enhancement_tpu.dsp import mel_filterbank


def _torch_mel(x, fs, n_fft, hop, win, num_mels, fmin, fmax, log_base):
    win = n_fft if win is None else win
    z = torch.stft(x, n_fft, hop, win, torch.hann_window(win), return_complex=True)
    amp = torch.sqrt(torch.clamp(z.real**2 + z.imag**2, min=1e-10)).transpose(2, 1)
    fb = torch.from_numpy(mel_filterbank(fs, n_fft, num_mels, fmin, fmax))
    mel = torch.clamp(amp @ fb, min=1e-10)
    if log_base is None:
        return torch.log(mel)
    return torch.log10(mel)


def test_multi_mel_loss_matches_torch(rng):
    x = rng.standard_normal((2, 1, 9600)).astype(np.float32) * 0.2
    y = x + 0.05 * rng.standard_normal((2, 1, 9600)).astype(np.float32)
    # the denoise config resolution (symAD_vctk_48000_hop300.yaml:88-97)
    loss = MultiMelSpectrogramLoss(
        fs=48000, fft_sizes=[2048], hop_sizes=[300], win_lengths=[None],
        num_mels=80, fmin=0, fmax=24000, log_base=None,
    )
    ours = float(loss(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(y.transpose(0, 2, 1))))
    xt = torch.from_numpy(x).reshape(-1, 9600)
    yt = torch.from_numpy(y).reshape(-1, 9600)
    ref = torch.nn.functional.l1_loss(
        _torch_mel(xt, 48000, 2048, 300, None, 80, 0, 24000, None),
        _torch_mel(yt, 48000, 2048, 300, None, 80, 0, 24000, None),
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_multi_stft_loss_matches_torch(rng):
    x = rng.standard_normal((2, 4800)).astype(np.float32)
    y = x + 0.1 * rng.standard_normal((2, 4800)).astype(np.float32)
    loss = MultiResolutionSTFTLoss()
    sc, mag = loss(jnp.asarray(x), jnp.asarray(y))

    def tstft(x, f, h, w):
        z = torch.stft(x, f, h, w, torch.hann_window(w), return_complex=True)
        return torch.sqrt(torch.clamp(z.real**2 + z.imag**2, min=1e-7)).transpose(2, 1)

    sc_ref = mag_ref = 0.0
    for f, h, w in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        xm = tstft(torch.from_numpy(x), f, h, w)
        ym = tstft(torch.from_numpy(y), f, h, w)
        sc_ref += (torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")).item()
        mag_ref += torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)).item()
    np.testing.assert_allclose(float(sc), sc_ref / 3, rtol=1e-4)
    np.testing.assert_allclose(float(mag), mag_ref / 3, rtol=1e-4)


def test_adversarial_losses(rng):
    outs = [
        [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32)) for _ in range(3)]
        for _ in range(4)
    ]
    outs_hat = [
        [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32)) for _ in range(3)]
        for _ in range(4)
    ]
    gen_loss = GeneratorAdversarialLoss(average_by_discriminators=False)
    ref = sum(float(np.mean((np.asarray(o[-1]) - 1) ** 2)) for o in outs_hat)
    np.testing.assert_allclose(float(gen_loss(outs_hat)), ref, rtol=1e-5)

    dis_loss = DiscriminatorAdversarialLoss(average_by_discriminators=False)
    real, fake = dis_loss(outs_hat, outs)
    real_ref = sum(float(np.mean((np.asarray(o[-1]) - 1) ** 2)) for o in outs)
    fake_ref = sum(float(np.mean(np.asarray(o[-1]) ** 2)) for o in outs_hat)
    np.testing.assert_allclose(float(real), real_ref, rtol=1e-5)
    np.testing.assert_allclose(float(fake), fake_ref, rtol=1e-5)

    # hinge variants
    g_hinge = GeneratorAdversarialLoss(loss_type="hinge")
    ref_h = np.mean([-np.mean(np.asarray(o[-1])) for o in outs_hat])
    np.testing.assert_allclose(float(g_hinge(outs_hat)), ref_h, rtol=1e-5)


def test_feat_match_loss(rng):
    feats = [
        [jnp.asarray(rng.standard_normal((2, 7)).astype(np.float32)) for _ in range(4)]
        for _ in range(3)
    ]
    feats_hat = [
        [jnp.asarray(rng.standard_normal((2, 7)).astype(np.float32)) for _ in range(4)]
        for _ in range(3)
    ]
    fm = FeatureMatchLoss(average_by_layers=False, average_by_discriminators=False)
    ref = sum(
        float(np.mean(np.abs(np.asarray(fh) - np.asarray(f))))
        for fhs, fs in zip(feats_hat, feats)
        for fh, f in zip(fhs[:-1], fs[:-1])
    )
    np.testing.assert_allclose(float(fm(feats_hat, feats)), ref, rtol=1e-5)


def test_shape_loss_matches_torch(rng):
    x = rng.standard_normal((2, 1, 1200)).astype(np.float32)
    y = rng.standard_normal((2, 1, 1200)).astype(np.float32)
    ours = MultiWindowShapeLoss(winlen=[300, 200, 100])(
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(y.transpose(0, 2, 1))
    )
    ref = 0.0
    for wl in (300, 200, 100):
        mp = torch.nn.MaxPool1d(wl)
        ref += torch.nn.functional.l1_loss(
            mp(torch.from_numpy(np.abs(x))), mp(torch.from_numpy(np.abs(y)))
        ).item()
    np.testing.assert_allclose(float(ours), ref / 3, rtol=1e-5)


def test_snr_matches_torchmetrics_formula(rng):
    x = rng.standard_normal((4, 4800)).astype(np.float32)
    y = x + 0.3 * rng.standard_normal((4, 4800)).astype(np.float32)
    ours = float(signal_noise_ratio(jnp.asarray(y), jnp.asarray(x)))
    ref = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_si_sdr_reasonable(rng):
    x = rng.standard_normal((4, 4800)).astype(np.float32)
    # scale invariance: scaling preds must not change SI-SDR
    a = scale_invariant_sdr(jnp.asarray(x * 3.0), jnp.asarray(x))
    assert float(a) > 50  # identical up to scale => very high
    noisy = x + 0.5 * rng.standard_normal((4, 4800)).astype(np.float32)
    b = scale_invariant_sdr(jnp.asarray(noisy), jnp.asarray(x))
    assert float(b) < float(a)
