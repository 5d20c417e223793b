"""UnivNet combined discriminator (MRSD + MPD).

Reference models/vocoder/UnivNet.py:23-103: concatenates the multi-resolution
spectral discriminator outputs with the multi-period discriminator outputs;
multi-channel inputs are flattened into the batch. (The UnivNet *generator*
preset in the reference reuses the HiFiGAN generator class with UnivNet-style
config values, so no separate generator module is needed.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models.discriminator import (
    HiFiGANMultiPeriodDiscriminator,
    UnivNetMultiResolutionSpectralDiscriminator,
)

Params = dict


class UnivNetDiscriminator:
    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), window="hann_window",
                 spectral_discriminator_params=None,
                 periods=(2, 3, 5, 7, 11), period_discriminator_params=None):
        self.mrsd = UnivNetMultiResolutionSpectralDiscriminator(
            fft_sizes=fft_sizes, hop_sizes=hop_sizes, win_lengths=win_lengths,
            window=window, discriminator_params=spectral_discriminator_params,
        )
        self.mpd = HiFiGANMultiPeriodDiscriminator(
            periods=periods, discriminator_params=period_discriminator_params,
        )

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"mrsd": self.mrsd.init(k1), "mpd": self.mpd.init(k2)}

    def __call__(self, p, x):
        """x: (B, T, C) waveform -> list of discriminator outputs."""
        b, t, c = x.shape
        if c != 1:
            x = jnp.transpose(x, (0, 2, 1)).reshape(b * c, t, 1)
        return self.mrsd(p["mrsd"], x) + self.mpd(p["mpd"], x)
