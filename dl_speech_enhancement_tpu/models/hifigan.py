"""Causal HiFiGAN vocoder generator + combined MSD+MPD discriminator.

Re-designs reference models/vocoder/HiFiGAN.py and modules/{residual_block,
multi_fusion}.py. All generator convs are weight-normed (g,v) params with the
official N(0, 0.01) initialization (HiFiGAN.py:134-177); the streaming decode
path mirrors the reference's ``decode_norm -> decode_input -> decode_upsample
-> decode_output`` split (HiFiGAN.py:268-296) as a single cache-threaded
``step``.

Input normalization from an analyzer-statistics array (mean/scale over the
code dim, HiFiGAN.py:126-131,206-219) is supported via ``stats=(mean, scale)``
numpy arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.nn.conv import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d1x1,
)
from dl_speech_enhancement_tpu.models.discriminator import (
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiPeriodDiscriminator,
)

Params = dict


def _leaky(x, slope=0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class HiFiGANResidualBlock:
    """Stacked (LeakyReLU -> dilated causal conv [-> LeakyReLU -> conv]) with
    residual adds. Reference modules/residual_block.py:23-106."""

    def __init__(self, kernel_size=3, channels=512, dilations=(1, 3, 5),
                 groups=1, bias=True, use_additional_convs=True,
                 negative_slope=0.1):
        assert kernel_size % 2 == 1
        self.use_additional_convs = use_additional_convs
        self.negative_slope = negative_slope
        self.convs1 = [
            CausalConv1d(channels, channels, kernel_size, dilation=d,
                         groups=groups, bias=bias, weight_norm=True,
                         w_init="normal")
            for d in dilations
        ]
        self.convs2 = (
            [CausalConv1d(channels, channels, kernel_size, dilation=1,
                          groups=groups, bias=bias, weight_norm=True,
                          w_init="normal")
             for _ in dilations]
            if use_additional_convs else []
        )

    def init(self, key) -> Params:
        n = len(self.convs1) + len(self.convs2)
        keys = jax.random.split(key, n)
        p = {"convs1": [c.init(k) for c, k in zip(self.convs1, keys[: len(self.convs1)])]}
        if self.use_additional_convs:
            p["convs2"] = [c.init(k) for c, k in zip(self.convs2, keys[len(self.convs1):])]
        return p

    def __call__(self, p, x):
        for i, conv1 in enumerate(self.convs1):
            xt = conv1(p["convs1"][i], _leaky(x, self.negative_slope))
            if self.use_additional_convs:
                xt = self.convs2[i](p["convs2"][i], _leaky(xt, self.negative_slope))
            x = xt + x
        return x

    def init_cache(self, batch):
        c = {"convs1": [conv.init_cache(batch) for conv in self.convs1]}
        if self.use_additional_convs:
            c["convs2"] = [conv.init_cache(batch) for conv in self.convs2]
        return c

    def step(self, p, cache, x):
        new1, new2 = [], []
        for i, conv1 in enumerate(self.convs1):
            xt, c1 = conv1.step(p["convs1"][i], cache["convs1"][i],
                                _leaky(x, self.negative_slope))
            new1.append(c1)
            if self.use_additional_convs:
                xt, c2 = self.convs2[i].step(p["convs2"][i], cache["convs2"][i],
                                             _leaky(xt, self.negative_slope))
                new2.append(c2)
            x = xt + x
        new = {"convs1": new1}
        if self.use_additional_convs:
            new["convs2"] = new2
        return x, new


class MultiReceptiveField:
    """Average of N resblocks with different kernel sizes.
    Reference modules/multi_fusion.py:23-79."""

    def __init__(self, channels=512, resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilations=((1, 3, 5),) * 3, groups=1, bias=True,
                 use_additional_convs=True, negative_slope=0.1):
        assert len(resblock_kernel_sizes) == len(resblock_dilations)
        self.blocks = [
            HiFiGANResidualBlock(k, channels, d, groups, bias,
                                 use_additional_convs, negative_slope)
            for k, d in zip(resblock_kernel_sizes, resblock_dilations)
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks))
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, keys)]}

    def __call__(self, p, x):
        cs = 0.0
        for b, bp in zip(self.blocks, p["blocks"]):
            cs = cs + b(bp, x)
        return cs / len(self.blocks)

    def init_cache(self, batch):
        return {"blocks": [b.init_cache(batch) for b in self.blocks]}

    def step(self, p, cache, x):
        cs = 0.0
        new = []
        for b, bp, bc in zip(self.blocks, p["blocks"], cache["blocks"]):
            y, c = b.step(bp, bc, x)
            cs = cs + y
            new.append(c)
        return cs / len(self.blocks), {"blocks": new}


class MultiGroupConv1d:
    """Single grouped resblock + 1x1 fuse — AudioDec v1's fast decoder trick
    (modules/multi_fusion.py:82-141; selected when len(kernel_sizes)==1 and
    groups>1, HiFiGAN.py:78-81)."""

    def __init__(self, channels=512, resblock_kernel_sizes=(3,),
                 resblock_dilations=((1, 3, 5),), groups=3, bias=True,
                 use_additional_convs=True, negative_slope=0.1):
        assert len(resblock_kernel_sizes) == len(resblock_dilations) == 1
        self.groups = groups
        self.block = HiFiGANResidualBlock(
            resblock_kernel_sizes[0], channels * groups, resblock_dilations[0],
            groups, bias, use_additional_convs, negative_slope,
        )
        self.conv_out = Conv1d1x1(channels * groups, channels, bias=False,
                                  weight_norm=True, w_init="normal")

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"block": self.block.init(k1), "conv_out": self.conv_out.init(k2)}

    def __call__(self, p, x):
        x = jnp.tile(x, (1, 1, self.groups))
        x = self.block(p["block"], x)
        return self.conv_out(p["conv_out"], x)

    def init_cache(self, batch):
        return {"block": self.block.init_cache(batch)}

    def step(self, p, cache, x):
        x = jnp.tile(x, (1, 1, self.groups))
        x, c = self.block.step(p["block"], cache["block"], x)
        return self.conv_out(p["conv_out"], x), {"block": c}


class HiFiGANGenerator:
    """Causal HiFiGAN generator (reference HiFiGAN.py:28-305).

    input causal conv -> per-stage (LeakyReLU -> causal transposed-conv
    upsample -> multi-fusion resblocks) -> LeakyReLU -> output conv -> tanh.
    """

    def __init__(self, in_channels=80, out_channels=1, channels=512,
                 kernel_size=7, upsample_scales=(8, 8, 2, 2),
                 upsample_kernel_sizes=(16, 16, 4, 4),
                 resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                 groups=1, bias=True, use_additional_convs=True,
                 negative_slope=0.1, stats=None):
        assert kernel_size % 2 == 1
        assert len(upsample_scales) == len(upsample_kernel_sizes)
        assert len(resblock_dilations) == len(resblock_kernel_sizes)
        if len(resblock_kernel_sizes) == 1 and groups > 1:
            fusion_cls = MultiGroupConv1d
        else:
            fusion_cls = MultiReceptiveField
        self.negative_slope = negative_slope
        self.num_upsamples = len(upsample_kernel_sizes)
        self.input_conv = CausalConv1d(in_channels, channels, kernel_size,
                                       weight_norm=True, w_init="normal")
        self.upsamples, self.blocks = [], []
        for i, (scale, k) in enumerate(zip(upsample_scales, upsample_kernel_sizes)):
            assert k == 2 * scale
            self.upsamples.append(
                CausalConvTranspose1d(channels // (2 ** i),
                                      channels // (2 ** (i + 1)), k, scale,
                                      weight_norm=True, w_init="normal")
            )
            self.blocks.append(fusion_cls(
                channels=channels // (2 ** (i + 1)),
                resblock_kernel_sizes=resblock_kernel_sizes,
                resblock_dilations=resblock_dilations,
                groups=groups, bias=bias,
                use_additional_convs=use_additional_convs,
                negative_slope=negative_slope,
            ))
        self.output_conv = CausalConv1d(channels // (2 ** (i + 1)), out_channels,
                                        kernel_size, weight_norm=True,
                                        w_init="normal")
        self.total_upsample = int(np.prod(upsample_scales))
        # stats: (2, in_channels) array [mean; scale] (HiFiGAN.py:206-219)
        if stats is not None:
            stats = np.asarray(stats)
            self.mean = jnp.asarray(stats[0].reshape(-1), jnp.float32)
            self.scale = jnp.asarray(stats[1].reshape(-1), jnp.float32)
            self.norm = True
        else:
            self.norm = False

    def init(self, key) -> Params:
        n = 2 + 2 * self.num_upsamples
        keys = jax.random.split(key, n)
        return {
            "input_conv": self.input_conv.init(keys[0]),
            "upsamples": [u.init(k) for u, k in zip(self.upsamples, keys[1:1 + self.num_upsamples])],
            "blocks": [b.init(k) for b, k in
                       zip(self.blocks, keys[1 + self.num_upsamples:-1])],
            "output_conv": self.output_conv.init(keys[-1]),
        }

    def _normalize(self, c):
        if self.norm:
            return (c - self.mean) / self.scale
        return c

    def __call__(self, p, c):
        """c: (B, T, in_channels) codes -> (B, T*prod(scales), out_channels)."""
        c = self._normalize(c)
        c = self.input_conv(p["input_conv"], c)
        for i in range(self.num_upsamples):
            c = self.upsamples[i](p["upsamples"][i], _leaky(c, self.negative_slope))
            c = self.blocks[i](p["blocks"][i], c)
        # upstream uses a default LeakyReLU (slope 0.01) before the output
        # conv (HiFiGAN.py:116), unlike the 0.1 used elsewhere
        c = self.output_conv(p["output_conv"], _leaky(c, 0.01))
        return jnp.tanh(c)

    def init_cache(self, batch):
        return {
            "input_conv": self.input_conv.init_cache(batch),
            "upsamples": [u.init_cache(batch) for u in self.upsamples],
            "blocks": [b.init_cache(batch) for b in self.blocks],
            "output_conv": self.output_conv.init_cache(batch),
        }

    def step(self, p, cache, c):
        """Streaming decode of one code chunk (HiFiGAN.py:268-296)."""
        c = self._normalize(c)
        c, ic = self.input_conv.step(p["input_conv"], cache["input_conv"], c)
        new_up, new_blocks = [], []
        for i in range(self.num_upsamples):
            c, uc = self.upsamples[i].step(p["upsamples"][i], cache["upsamples"][i],
                                           _leaky(c, self.negative_slope))
            new_up.append(uc)
            c, bc = self.blocks[i].step(p["blocks"][i], cache["blocks"][i], c)
            new_blocks.append(bc)
        c, oc = self.output_conv.step(p["output_conv"], cache["output_conv"],
                                      _leaky(c, 0.01))
        y = jnp.tanh(c)
        return y, {"input_conv": ic, "upsamples": new_up,
                   "blocks": new_blocks, "output_conv": oc}


class HiFiGANDiscriminator:
    """MSD + MPD combo (reference HiFiGAN.py:308-395). Outputs are the two
    discriminators' per-layer feature lists concatenated."""

    def __init__(self, scales=3, scale_downsample_pooling="AvgPool1d",
                 scale_downsample_pooling_params=None,
                 scale_discriminator_params=None, follow_official_norm=True,
                 periods=(2, 3, 5, 7, 11), period_discriminator_params=None):
        self.msd = HiFiGANMultiScaleDiscriminator(
            scales=scales,
            downsample_pooling=scale_downsample_pooling,
            downsample_pooling_params=scale_downsample_pooling_params or {},
            discriminator_params=scale_discriminator_params or {},
            follow_official_norm=follow_official_norm,
        )
        self.mpd = HiFiGANMultiPeriodDiscriminator(
            periods=periods,
            discriminator_params=period_discriminator_params or {},
        )

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"msd": self.msd.init(k1), "mpd": self.mpd.init(k2)}

    def __call__(self, p, x):
        """x: (B, T, C) waveform -> list of per-discriminator feature lists."""
        b, t, ch = x.shape
        if ch != 1:
            x = jnp.transpose(x, (0, 2, 1)).reshape(b * ch, t, 1)
        return self.msd(p["msd"], x) + self.mpd(p["mpd"], x)

    @property
    def num_subs(self):
        return len(self.msd.discriminators) + len(self.mpd.discriminators)

    def apply_sub(self, p, i, x):
        """Feature list of sub-discriminator ``i`` alone — MSD scales first,
        then MPD periods, matching the ``__call__`` concatenation order.
        Lets trainers checkpoint per sub-D so only one feature list is live
        at a time (large-batch adversarial training in 16 GB HBM)."""
        b, t, ch = x.shape
        if ch != 1:
            x = jnp.transpose(x, (0, 2, 1)).reshape(b * ch, t, 1)
        n_msd = len(self.msd.discriminators)
        if i < n_msd:
            return self.msd.apply_sub(p["msd"], i, x)
        return self.mpd.apply_sub(p["mpd"], i - n_msd, x)
