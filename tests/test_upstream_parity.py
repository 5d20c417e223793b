"""Deep parity vs the upstream torch implementation with transplanted weights.

These tests import the reference repo (read-only mount) and require exact or
near-exact numerical agreement. torchaudio is unavailable, so modules that
import it (the discriminator zoo) are stubbed out before importing upstream
HiFiGAN — only generator paths are compared.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference, add_reference_to_path


def _stub_torchaudio():
    if "torchaudio" in sys.modules:
        return
    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")
    func.spectrogram = lambda *a, **k: None
    ta.functional = func
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = func


def conv_w(m):
    return jnp.asarray(m.weight.detach().numpy().transpose(2, 1, 0))


def conv_b(m):
    return jnp.asarray(m.bias.detach().numpy())


def deconv_w(m):
    return jnp.asarray(m.weight.detach().numpy()[:, :, ::-1].transpose(2, 0, 1).copy())


def wn_conv_params(m):
    """torch weight-normed Conv1d -> our {v, g, b}."""
    return {
        "v": conv_w_raw(m.weight_v),
        "g": jnp.asarray(m.weight_g.detach().numpy().transpose(2, 1, 0)),
        "b": conv_b(m),
    }


def conv_w_raw(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


def wn_deconv_params(m):
    return {
        "v": jnp.asarray(m.weight_v.detach().numpy()[:, :, ::-1].transpose(2, 0, 1).copy()),
        "g": jnp.asarray(m.weight_g.detach().numpy()[:, :, ::-1].transpose(2, 0, 1).copy()),
        "b": conv_b(m),
    }


@requires_reference
def test_hifigan_generator_matches_upstream(rng):
    """Upstream causal HiFiGAN generator (weight-normed) vs ours, same weights."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    kw = dict(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3, 7), resblock_dilations=[(1, 3), (1, 3)],
        groups=1, bias=True, use_additional_convs=True,
    )
    tg = TorchHiFiGAN(**kw, use_weight_norm=True, stats=None)
    tg.eval()

    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    ours = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    )

    def resblock_params(tb):
        p = {"convs1": [wn_conv_params(c.conv) for c in tb.convs1]}
        p["convs2"] = [wn_conv_params(c.conv) for c in tb.convs2]
        return p

    params = {
        "input_conv": wn_conv_params(tg.input_conv.conv),
        "upsamples": [wn_deconv_params(u.deconv) for u in tg.upsamples],
        "blocks": [
            {"blocks": [resblock_params(b) for b in blk.blocks]}
            for blk in tg.blocks
        ],
        "output_conv": wn_conv_params(tg.output_conv.conv),
    }

    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_hifigan_streaming_matches_upstream(rng):
    """Upstream HiFiGAN StreamGenerator.decode chunks vs our step()."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import StreamGenerator as TorchStream

    kw = dict(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=[(1, 3)],
        groups=1, bias=True, use_additional_convs=True,
    )
    tg = TorchStream(**kw, use_weight_norm=True, stats=None)
    tg.eval()

    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    ours = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )

    def resblock_params(tb):
        return {"convs1": [wn_conv_params(c.conv) for c in tb.convs1],
                "convs2": [wn_conv_params(c.conv) for c in tb.convs2]}

    params = {
        "input_conv": wn_conv_params(tg.input_conv.conv),
        "upsamples": [wn_deconv_params(u.deconv) for u in tg.upsamples],
        "blocks": [{"blocks": [resblock_params(b) for b in blk.blocks]}
                   for blk in tg.blocks],
        "output_conv": wn_conv_params(tg.output_conv.conv),
    }

    tg.reset_buffer()
    cache = ours.init_cache(1)
    for i in range(4):
        c = rng.standard_normal((1, 5, 16)).astype(np.float32) * 0.5
        with torch.no_grad():
            # upstream decode() takes (B, T, C) and transposes internally
            ref = tg.decode(torch.tensor(c)).numpy()
        got, cache = ours.step(params, cache, jnp.asarray(c))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), ref, atol=2e-5,
            err_msg=f"chunk {i}",
        )


@requires_reference
def test_discriminator_zoo_matches_upstream(rng):
    """MPD + MSD with transplanted weights: every per-layer feature map must
    match upstream (training losses consume all of them)."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.modules.discriminator import (
        HiFiGANMultiPeriodDiscriminator as TorchMPD,
        HiFiGANMultiScaleDiscriminator as TorchMSD,
    )
    from dl_speech_enhancement_tpu.models import (
        HiFiGANMultiPeriodDiscriminator, HiFiGANMultiScaleDiscriminator,
    )

    # ---- MPD (weight-normed Conv2d stack)
    p_kw = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32}
    tmpd = TorchMPD(periods=[2, 3], discriminator_params={
        **p_kw, "bias": True, "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
        "use_weight_norm": True, "use_spectral_norm": False,
    })
    tmpd.eval()
    ours_mpd = HiFiGANMultiPeriodDiscriminator(
        periods=(2, 3), discriminator_params=p_kw)

    def wn_conv2d(m):
        # torch (out,in,kh,kw) -> ours (kh,kw,in,out)
        return {
            "v": jnp.asarray(m.weight_v.detach().numpy().transpose(2, 3, 1, 0)),
            "g": jnp.asarray(m.weight_g.detach().numpy().transpose(2, 3, 1, 0)),
            "b": jnp.asarray(m.bias.detach().numpy()),
        }

    params = {"discriminators": []}
    for d in tmpd.discriminators:
        params["discriminators"].append({
            "convs": [wn_conv2d(seq[0]) for seq in d.convs],
            "output_conv": wn_conv2d(d.output_conv),
        })
    x = rng.standard_normal((2, 1, 90)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmpd(torch.tensor(x))
    got = ours_mpd(params, jnp.asarray(x.transpose(0, 2, 1)))
    assert len(got) == len(ref)
    for g_outs, r_outs in zip(got, ref):
        assert len(g_outs) == len(r_outs)
        for g, r in zip(g_outs, r_outs):
            r = r.numpy()
            g = np.asarray(g)
            if g.ndim == 4:  # ours NHWC vs torch NCHW
                g = g.transpose(0, 3, 1, 2)
            np.testing.assert_allclose(g, r, atol=2e-5)

    # ---- MSD (plain Conv1d stack; upstream norm application is a no-op)
    s_kw = {"in_channels": 1, "out_channels": 1,
            "kernel_sizes": [15, 41, 5, 3], "channels": 16,
            "max_downsample_channels": 64, "max_groups": 16,
            "downsample_scales": [2, 2, 1]}
    tmsd = TorchMSD(scales=2, discriminator_params={
        **s_kw, "bias": True, "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
    }, follow_official_norm=True)
    tmsd.eval()
    ours_msd = HiFiGANMultiScaleDiscriminator(
        scales=2, discriminator_params=s_kw, follow_official_norm=True)

    def plain_conv1d(m):
        return {"w": conv_w_raw(m.weight), "b": conv_b(m)}

    params = {"discriminators": []}
    for d in tmsd.discriminators:
        layers = []
        for layer in d.layers:
            conv = layer[0] if isinstance(layer, torch.nn.Sequential) else layer
            layers.append(plain_conv1d(conv))
        params["discriminators"].append({"layers": layers})
    x = rng.standard_normal((2, 1, 240)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmsd(torch.tensor(x))
    got = ours_msd(params, jnp.asarray(x.transpose(0, 2, 1)))
    for g_outs, r_outs in zip(got, ref):
        assert len(g_outs) == len(r_outs)
        for g, r in zip(g_outs, r_outs):
            np.testing.assert_allclose(
                np.asarray(g).transpose(0, 2, 1), r.numpy(), atol=2e-5)


@requires_reference
def test_hifigan_grouped_fast_decoder_matches_upstream(rng):
    """AudioDec v1's MultiGroupConv1d decoder trick (grouped convs + 1x1
    fuse) vs upstream with transplanted weights — pins the grouped-conv
    weight layout for feature_group_count."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    kw = dict(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(11,), resblock_dilations=[(1, 3, 5)],
        groups=3, bias=True, use_additional_convs=True,
    )
    tg = TorchHiFiGAN(**kw, use_weight_norm=True, stats=None)
    tg.eval()

    from dl_speech_enhancement_tpu.models import HiFiGANGenerator
    from dl_speech_enhancement_tpu.models.hifigan import MultiGroupConv1d
    ours = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=64, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5),), groups=3,
    )
    assert isinstance(ours.blocks[0], MultiGroupConv1d)

    def wn_1x1(m):  # upstream Conv1d1x1 with weight norm
        return {
            "v": conv_w_raw(m.weight_v),
            "g": jnp.asarray(m.weight_g.detach().numpy().transpose(2, 1, 0)),
        }

    def group_block_params(blk):
        return {
            "block": {
                "convs1": [wn_conv_params(c.conv) for c in blk.convs1],
                "convs2": [wn_conv_params(c.conv) for c in blk.convs2],
            },
            "conv_out": wn_1x1(blk.conv_out),
        }

    params = {
        "input_conv": wn_conv_params(tg.input_conv.conv),
        "upsamples": [wn_deconv_params(u.deconv) for u in tg.upsamples],
        "blocks": [group_block_params(blk) for blk in tg.blocks],
        "output_conv": wn_conv_params(tg.output_conv.conv),
    }
    c = rng.standard_normal((2, 16, 15)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_streaming_generator_matches_upstream_stream(rng):
    """Upstream StreamGenerator chunked encode/quantize/lookup/decode vs our
    streaming pipeline, identical weights and chunks."""
    add_reference_to_path()
    from models.autoencoder.AudioDec import StreamGenerator as TorchStream

    kw = dict(input_channels=1, output_channels=1, encode_channels=8,
              decode_channels=8, code_dim=16, codebook_num=2, codebook_size=32,
              enc_ratios=(2, 4), dec_ratios=(4, 2), enc_strides=(3, 4),
              dec_strides=(4, 3), mode="causal")
    tg = TorchStream(**kw)
    tg.eval()

    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.nn.vq import VQState
    from dl_speech_enhancement_tpu.stream import AudioCodec

    gen = AudioDecGenerator(encode_channels=8, decode_channels=8, code_dim=16,
                            codebook_num=2, codebook_size=32,
                            enc_ratios=(2, 4), dec_ratios=(4, 2),
                            enc_strides=(3, 4), dec_strides=(4, 3),
                            use_pqc=True)

    def res_unit_params(tu):
        return {"conv1": {"w": conv_w(tu.conv1.conv)},
                "conv2": {"w": conv_w_raw(tu.conv2.weight)}}

    enc = {"conv": {"w": conv_w(tg.encoder.conv.conv)}, "blocks": []}
    for blk in tg.encoder.conv_blocks:
        enc["blocks"].append({
            "res": [res_unit_params(u) for u in blk.res_units],
            "conv": {"w": conv_w(blk.conv.conv), "b": conv_b(blk.conv.conv)},
        })
    dec = {"conv1": {"w": conv_w(tg.decoder.conv1.conv)}, "blocks": [],
           "conv2": {"w": conv_w(tg.decoder.conv2.conv)}}
    for blk in tg.decoder.conv_blocks:
        dec["blocks"].append({
            "conv": {"w": deconv_w(blk.conv.deconv), "b": conv_b(blk.conv.deconv)},
            "res": [res_unit_params(u) for u in blk.res_units],
        })
    params = {
        "encoder": enc,
        "projector": {"conv": {"w": conv_w(tg.projector.project.conv)}},
        "decoder": dec,
    }
    embeds = np.stack([l.embed.numpy() for l in tg.quantizer.codebook.layers])
    vq_state = VQState(jnp.asarray(embeds),
                       jnp.zeros((2, 32), jnp.float32), jnp.asarray(embeds))

    hop = gen.hop  # 12
    receptive = hop * 16
    # upstream priming (zero receptive field)
    with torch.no_grad():
        zq0 = tg.initial_encoder(receptive, "cpu")
        tg.initial_decoder(zq0)

    codec = AudioCodec(gen, params, vq_state, receptive_length=receptive)
    codec.load()

    chunk = hop * 4
    x = rng.standard_normal((1, chunk * 6, 1)).astype(np.float32) * 0.3
    outs_ref, outs_ours = [], []
    for i in range(6):
        seg = x[:, i * chunk : (i + 1) * chunk]
        with torch.no_grad():
            z_t = tg.encode(torch.tensor(seg.transpose(0, 2, 1)))
            idx_t = tg.quantize(z_t)
            zq_t = tg.lookup(idx_t)
            y_t = tg.decode(zq_t)
        outs_ref.append(y_t.numpy())

        idx = codec._encode(jnp.asarray(seg))
        np.testing.assert_array_equal(
            np.asarray(idx).reshape(-1), idx_t.numpy().reshape(-1)
        )
        y = codec._decode(idx)
        outs_ours.append(np.asarray(y).transpose(0, 2, 1))

    ref = np.concatenate(outs_ref, axis=-1)
    got = np.concatenate(outs_ours, axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-4)
