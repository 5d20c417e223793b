"""GAN discriminator zoo: HiFiGAN MPD / MSD and UnivNet MRSD.

Re-designs reference models/vocoder/modules/discriminator.py. All return
per-layer feature lists with the final logits last, matching the loss
contracts (losses consume list-of-list with ``[-1]`` as logits).

Norm behavior faithfully reproduces the reference *as it actually runs*:

- MPD (Conv2d stack): weight norm applied (discriminator.py:139-147).
- MSD (Conv1d stack): the reference's ``apply_weight_norm``/
  ``apply_spectral_norm`` only match ``Conv2d`` modules, while the layers are
  ``Conv1d`` — so **no norm is applied at all**, regardless of
  ``follow_official_norm`` (documented reference bug, discriminator.py:354-372).
  We default to the same effective behavior (plain convs, and
  ``follow_official_norm`` stays a config-compat no-op so reference configs
  behave identically); the intended parametrizations are actually
  implemented here and reachable via ``discriminator_params``'s
  ``use_weight_norm``/``use_spectral_norm``.
- MRSD (UnivNet, Conv2d stack): weight norm applied (discriminator.py:572-580).

Input layout: waveforms are (B, T, 1); the MPD reshapes to
(B, T/p, p, C)-style 2-D maps with period on the W axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dl_speech_enhancement_tpu.nn.conv import Conv1d, Conv2d
from dl_speech_enhancement_tpu.dsp.stft import hann_window, spectrogram

Params = dict


def _leaky(x, slope):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class HiFiGANPeriodDiscriminator:
    """Period discriminator (reference discriminator.py:26-157)."""

    def __init__(self, in_channels=1, out_channels=1, period=3,
                 kernel_sizes=(5, 3), channels=32,
                 downsample_scales=(3, 3, 3, 3, 1),
                 max_downsample_channels=1024, bias=True,
                 negative_slope=0.1, use_weight_norm=True,
                 use_spectral_norm=False):
        assert len(kernel_sizes) == 2
        assert kernel_sizes[0] % 2 == 1 and kernel_sizes[1] % 2 == 1
        if use_spectral_norm:
            use_weight_norm = False  # mutually exclusive (discriminator.py:135-138)
        self.period = period
        self.negative_slope = negative_slope
        self.convs = []
        in_chs, out_chs = in_channels, channels
        for scale in downsample_scales:
            self.convs.append(Conv2d(
                in_chs, out_chs, (kernel_sizes[0], 1), (scale, 1),
                padding=((kernel_sizes[0] - 1) // 2, 0), bias=bias,
                weight_norm=use_weight_norm, spectral_norm=use_spectral_norm,
            ))
            in_chs = out_chs
            out_chs = min(out_chs * 4, max_downsample_channels)
        self.output_conv = Conv2d(
            in_chs, out_channels, (kernel_sizes[1] - 1, 1), (1, 1),
            padding=((kernel_sizes[1] - 1) // 2, 0), bias=bias,
            weight_norm=use_weight_norm, spectral_norm=use_spectral_norm,
        )

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.convs) + 1)
        return {
            "convs": [c.init(k) for c, k in zip(self.convs, keys[:-1])],
            "output_conv": self.output_conv.init(keys[-1]),
        }

    def __call__(self, p, x):
        """x: (B, T, C) -> list of per-layer features (last = flat logits)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            # reflect pad at the end (discriminator.py:122-125)
            x = jnp.concatenate([x, x[:, t - n_pad - 1 : t - 1][:, ::-1]], axis=1)
            t = t + n_pad
        # (B, T, C) -> (B, T/P, P, C): H = T/P, W = P (torch uses (B,C,T/P,P))
        x = x.reshape(b, t // self.period, self.period, c)
        outs = []
        for conv, cp in zip(self.convs, p["convs"]):
            x = _leaky(conv(cp, x), self.negative_slope)
            outs.append(x)
        x = self.output_conv(p["output_conv"], x)
        outs.append(x.reshape(b, -1))
        return outs


class HiFiGANMultiPeriodDiscriminator:
    """Reference discriminator.py:160-209."""

    def __init__(self, periods=(2, 3, 5, 7, 11), discriminator_params=None):
        params = dict(discriminator_params or {})
        params.pop("period", None)
        self.discriminators = [
            HiFiGANPeriodDiscriminator(period=p, **_clean_mpd(params))
            for p in periods
        ]

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discriminators": [d.init(k) for d, k in zip(self.discriminators, keys)]}

    def __call__(self, p, x):
        return [d(dp, x) for d, dp in zip(self.discriminators, p["discriminators"])]

    def apply_sub(self, p, i, x):
        """Feature list of period discriminator ``i`` alone (same result as
        ``__call__(p, x)[i]``) — lets trainers rematerialize per sub-D."""
        return self.discriminators[i](p["discriminators"][i], x)


def _clean_mpd(params: dict) -> dict:
    """Translate reference YAML keys to constructor args."""
    out = dict(params)
    nl = out.pop("nonlinear_activation", "LeakyReLU")
    nlp = out.pop("nonlinear_activation_params", {"negative_slope": 0.1})
    assert nl == "LeakyReLU"
    out["negative_slope"] = nlp.get("negative_slope", 0.1)
    return out


class HiFiGANScaleDiscriminator:
    """Scale discriminator (reference discriminator.py:212-352): first conv,
    grouped downsampling convs, two output convs. Plain (un-normed) convs by
    default — see module docstring."""

    def __init__(self, in_channels=1, out_channels=1,
                 kernel_sizes=(15, 41, 5, 3), channels=128,
                 max_downsample_channels=1024, max_groups=16, bias=True,
                 downsample_scales=(2, 2, 4, 4, 1), negative_slope=0.1,
                 use_weight_norm=False, use_spectral_norm=False):
        assert len(kernel_sizes) == 4
        for ks in kernel_sizes:
            assert ks % 2 == 1
        if use_spectral_norm:
            use_weight_norm = False  # mutually exclusive, as in torch
        norms = dict(weight_norm=use_weight_norm,
                     spectral_norm=use_spectral_norm)
        self.negative_slope = negative_slope
        self.layers = []
        self.layers.append(Conv1d(in_channels, channels, kernel_sizes[0],
                                  padding=(kernel_sizes[0] - 1) // 2, bias=bias,
                                  **norms))
        in_chs = out_chs = channels
        groups = 4
        for scale in downsample_scales:
            self.layers.append(Conv1d(in_chs, out_chs, kernel_sizes[1],
                                      stride=scale,
                                      padding=(kernel_sizes[1] - 1) // 2,
                                      groups=groups, bias=bias, **norms))
            in_chs = out_chs
            out_chs = min(in_chs * 2, max_downsample_channels)
            groups = min(groups * 4, max_groups)
        out_chs = min(in_chs * 2, max_downsample_channels)
        self.layers.append(Conv1d(in_chs, out_chs, kernel_sizes[2],
                                  padding=(kernel_sizes[2] - 1) // 2, bias=bias,
                                  **norms))
        self.layers.append(Conv1d(out_chs, out_channels, kernel_sizes[3],
                                  padding=(kernel_sizes[3] - 1) // 2, bias=bias,
                                  **norms))

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {"layers": [l.init(k) for l, k in zip(self.layers, keys)]}

    def __call__(self, p, x):
        outs = []
        n = len(self.layers)
        for i, (layer, lp) in enumerate(zip(self.layers, p["layers"])):
            x = layer(lp, x)
            if i < n - 1:  # all but the final logit conv get LeakyReLU
                x = _leaky(x, self.negative_slope)
            outs.append(x)
        return outs


def _avg_pool1d(x, kernel_size=4, stride=2, padding=2):
    """torch AvgPool1d(count_include_pad=True) over (B, T, C)."""
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, kernel_size, 1), (1, stride, 1), "VALID"
    )
    return summed / kernel_size


class HiFiGANMultiScaleDiscriminator:
    """3 scales with AvgPool downsampling between (discriminator.py:375-447)."""

    def __init__(self, scales=3, downsample_pooling="AvgPool1d",
                 downsample_pooling_params=None, discriminator_params=None,
                 follow_official_norm=False):
        assert downsample_pooling == "AvgPool1d"
        self.pool_params = {
            "kernel_size": 4, "stride": 2, "padding": 2,
            **(downsample_pooling_params or {}),
        }
        params = _clean_msd(dict(discriminator_params or {}))
        # follow_official_norm is accepted for config compatibility but has
        # NO effect, faithfully matching the reference *as it runs*: its
        # apply_weight_norm/apply_spectral_norm only match Conv2d while the
        # layers are Conv1d, so the official pattern (spectral on scale 0,
        # weight norm on the rest, discriminator.py:389-401) is a silent
        # no-op (documented bug, discriminator.py:354-372). Every reference
        # config sets this flag True and trained without norms. To opt into
        # real parametrizations, set use_weight_norm/use_spectral_norm in
        # discriminator_params — implemented here, unlike upstream.
        del follow_official_norm
        self.discriminators = [HiFiGANScaleDiscriminator(**params)
                               for _ in range(scales)]

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discriminators": [d.init(k) for d, k in zip(self.discriminators, keys)]}

    def __call__(self, p, x):
        outs = []
        for d, dp in zip(self.discriminators, p["discriminators"]):
            outs.append(d(dp, x))
            x = _avg_pool1d(x, **self.pool_params)
        return outs

    def apply_sub(self, p, i, x):
        """Feature list of scale ``i`` alone (same pre-pooling as
        ``__call__``) — lets trainers rematerialize per sub-D."""
        for _ in range(i):
            x = _avg_pool1d(x, **self.pool_params)
        return self.discriminators[i](p["discriminators"][i], x)


def _clean_msd(params: dict) -> dict:
    out = dict(params)
    nl = out.pop("nonlinear_activation", "LeakyReLU")
    nlp = out.pop("nonlinear_activation_params", {"negative_slope": 0.1})
    assert nl == "LeakyReLU"
    out["negative_slope"] = nlp.get("negative_slope", 0.1)
    return out


class UnivNetSpectralDiscriminator:
    """Spectrogram -> 2-D conv stack (reference discriminator.py:450-570)."""

    def __init__(self, fft_size, hop_size, win_length, window="hann_window",
                 kernel_sizes=((3, 9), (3, 9), (3, 9), (3, 9), (3, 3), (3, 3)),
                 strides=((1, 1), (1, 2), (1, 2), (1, 2), (1, 1), (1, 1)),
                 channels=32, bias=True, negative_slope=0.2,
                 use_weight_norm=True):
        assert window == "hann_window"
        assert len(kernel_sizes) == len(strides)
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length
        self.window = hann_window(win_length)
        self.negative_slope = negative_slope
        self.layers = [
            Conv2d(1, channels, tuple(kernel_sizes[0]), tuple(strides[0]),
                   padding=(0, 0), bias=bias, weight_norm=use_weight_norm)
        ]
        for i in range(1, len(kernel_sizes) - 1):
            self.layers.append(Conv2d(channels, channels, tuple(kernel_sizes[i]),
                                      tuple(strides[i]), padding=(0, 0),
                                      bias=bias, weight_norm=use_weight_norm))
        self.layers.append(Conv2d(channels, 1, tuple(kernel_sizes[-1]),
                                  tuple(strides[-1]), padding=(0, 0), bias=bias,
                                  weight_norm=use_weight_norm))

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {"layers": [l.init(k) for l, k in zip(self.layers, keys)]}

    def __call__(self, p, x):
        """x: (B, T, 1) -> final map only (the reference returns the last
        tensor, not a feature list, discriminator.py:549-570)."""
        spec = spectrogram(
            x[..., 0], self.window, n_fft=self.fft_size, hop=self.hop_size,
            win_length=self.win_length, pad=self.win_length // 2, power=1.0,
        )  # (B, frames, freq)
        h = spec[..., None]  # (B, frames, freq, 1) == NHWC
        n = len(self.layers)
        for i, (layer, lp) in enumerate(zip(self.layers, p["layers"])):
            h = layer(lp, h)
            if i < n - 1:
                h = _leaky(h, self.negative_slope)
        return h


class UnivNetMultiResolutionSpectralDiscriminator:
    """3 spectral resolutions (reference discriminator.py:583-638)."""

    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), window="hann_window",
                 discriminator_params=None):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        params = _clean_msd(dict(discriminator_params or {}))
        self.discriminators = [
            UnivNetSpectralDiscriminator(f, h, w, window, **params)
            for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)
        ]

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.discriminators))
        return {"discriminators": [d.init(k) for d, k in zip(self.discriminators, keys)]}

    def __call__(self, p, x):
        return [d(dp, x) for d, dp in zip(self.discriminators, p["discriminators"])]
