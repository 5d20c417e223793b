"""Golden tests for the reference-checkpoint exporter.

``utils/torch_export.py`` is the inverse of the importer: our param trees
become reference state_dicts. Every test loads the export into the
reference's *own* torch modules with ``strict=True`` (so any missing /
extra / mis-shaped key fails loudly) and requires forward agreement.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference, add_reference_to_path

from dl_speech_enhancement_tpu.models import (
    AudioDecGenerator,
    HiFiGANDiscriminator,
    HiFiGANGenerator,
)
from dl_speech_enhancement_tpu.utils.torch_export import (
    export_audiodec_generator,
    export_hifigan_discriminator,
    export_hifigan_generator,
)

from conftest import SMALL_TOPOLOGY as SMALL
from conftest import stub_torchaudio as _stub_torchaudio


def _to_torch(sd):
    # mirrors the (function-local) to_torch inside cli/export_checkpoint
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}


@requires_reference
def test_export_audiodec_generator_pqc(rng):
    add_reference_to_path()
    from models.autoencoder.AudioDec import Generator as TorchGen

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(3))
    sd = export_audiodec_generator(params, vq_state, gen)

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    tg.load_state_dict(_to_torch(sd), strict=True)
    tg.eval()

    x = rng.standard_normal((2, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        e_t = tg.encoder(torch.tensor(x.transpose(0, 2, 1)))
        zq_t, _ = tg.quantizer.inference(tg.projector(e_t))
        y_t = tg.decoder(zq_t).numpy()
    e = gen.encoder(params["encoder"], jnp.asarray(x))
    zq, _ = gen.quantizer.inference(vq_state, gen.projector(params["projector"], e))
    y = gen.decoder(params["decoder"], zq)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_export_audiodec_generator_without_pqc(rng):
    """The export must carry the placeholder projector/quantizer/conv1
    entries the reference module constructs (strict load pins that), and
    the used subgraph must agree."""
    add_reference_to_path()
    from models.autoencoder_without_PQC.AudioDec import Generator as TorchGen

    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, _ = gen.init(jax.random.PRNGKey(4))
    sd = export_audiodec_generator(
        params, None, gen,
        generator_config=dict(SMALL, input_channels=1, output_channels=1))

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    tg.load_state_dict(_to_torch(sd), strict=True)
    tg.eval()

    x = rng.standard_normal((2, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        y_t = tg(torch.tensor(x.transpose(0, 2, 1))).numpy()
    y, *_ = gen(params, None, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_export_hifigan_generator_with_stats(rng, tmp_path):
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    stats = rng.standard_normal((2, 16)).astype(np.float32)
    stats[1] = np.abs(stats[1]) + 0.5
    stats_path = str(tmp_path / "stats.npy")
    np.save(stats_path, np.zeros((2, 16), np.float32) + 1.0)  # overwritten

    kw = dict(in_channels=16, out_channels=1, channels=64, kernel_size=7,
              upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
              resblock_kernel_sizes=(3, 7), groups=1, bias=True,
              use_additional_convs=True)
    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3), (1, 3)),
                            stats=stats)
    params = ours.init(jax.random.PRNGKey(5))
    sd = export_hifigan_generator(params, ours)
    assert np.allclose(sd["mean"], stats[0]) and np.allclose(sd["scale"],
                                                             stats[1])

    tg = TorchHiFiGAN(**kw, resblock_dilations=[(1, 3), (1, 3)],
                      use_weight_norm=True, stats=stats_path)
    tg.load_state_dict(_to_torch(sd), strict=True)
    tg.eval()

    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    with torch.no_grad():
        # both forwards apply the stats input-norm (HiFiGAN.py:151-153)
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_export_hifigan_grouped_fast_decoder(rng):
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    kw = dict(in_channels=16, out_channels=1, channels=64, kernel_size=7,
              upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
              resblock_kernel_sizes=(11,), groups=3, bias=True,
              use_additional_convs=True)
    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3, 5),))
    params = ours.init(jax.random.PRNGKey(6))
    sd = export_hifigan_generator(params, ours)

    tg = TorchHiFiGAN(**kw, resblock_dilations=[(1, 3, 5)],
                      use_weight_norm=True, stats=None)
    tg.load_state_dict(_to_torch(sd), strict=True)
    tg.eval()

    c = rng.standard_normal((2, 16, 15)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_export_hifigan_discriminator(rng):
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Discriminator as TorchDisc

    s_kw = {"in_channels": 1, "out_channels": 1,
            "kernel_sizes": [15, 41, 5, 3], "channels": 16,
            "max_downsample_channels": 64, "max_groups": 16,
            "downsample_scales": [2, 2, 1]}
    p_kw = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32}
    ours = HiFiGANDiscriminator(
        scales=2, scale_discriminator_params=s_kw, follow_official_norm=True,
        periods=(2, 3), period_discriminator_params=p_kw)
    params = ours.init(jax.random.PRNGKey(7))
    sd = export_hifigan_discriminator(params, ours)

    td = TorchDisc(
        scales=2,
        scale_discriminator_params={
            **s_kw, "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1}},
        follow_official_norm=True,
        periods=[2, 3],
        period_discriminator_params={
            **p_kw, "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True, "use_spectral_norm": False},
    )
    td.load_state_dict(_to_torch(sd), strict=True)
    td.eval()

    x = rng.standard_normal((2, 1, 240)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = td(torch.tensor(x))
    got = ours(params, jnp.asarray(x.transpose(0, 2, 1)))
    for g_outs, r_outs in zip(got, ref):
        assert len(g_outs) == len(r_outs)
        for g, r in zip(g_outs, r_outs):
            r, g = r.numpy(), np.asarray(g)
            if g.ndim == 4:
                g = g.transpose(0, 3, 1, 2)
            elif g.ndim == 3:
                g = g.transpose(0, 2, 1)
            np.testing.assert_allclose(g.reshape(r.shape), r, atol=2e-5)


def test_export_import_roundtrip_identity(rng):
    """export -> import must reproduce the original params bit-exactly
    (no reference repo needed: pure layout round-trip)."""
    from dl_speech_enhancement_tpu.utils.torch_import import (
        import_audiodec_generator,
    )

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(8))
    sd = export_audiodec_generator(params, vq_state, gen)
    params2, vq2 = import_audiodec_generator(sd, gen)
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(vq_state, vq2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_rejects_weight_normed_msd():
    from dl_speech_enhancement_tpu.models import HiFiGANMultiScaleDiscriminator

    s_kw = {"in_channels": 1, "out_channels": 1,
            "kernel_sizes": [15, 41, 5, 3], "channels": 16,
            "max_downsample_channels": 64, "max_groups": 16,
            "downsample_scales": [2, 2, 1], "use_weight_norm": True}
    msd = HiFiGANMultiScaleDiscriminator(scales=1, discriminator_params=s_kw,
                                         follow_official_norm=False)
    p_kw = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32}
    combo = HiFiGANDiscriminator(
        scales=1, scale_discriminator_params=s_kw, follow_official_norm=False,
        periods=(2,), period_discriminator_params=p_kw)
    params = {"msd": msd.init(jax.random.PRNGKey(0)),
              "mpd": combo.mpd.init(jax.random.PRNGKey(1))}
    with pytest.raises(ValueError, match="no-op"):
        export_hifigan_discriminator(params, combo)


# ------------------------------------------------------------------ CLI e2e

@requires_reference
def test_export_checkpoint_cli_roundtrip(rng, tmp_path):
    """Our checkpoint -> export CLI -> reference torch module, framework
    format with discriminator, plus course format."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.autoencoder.AudioDec import Generator as TorchGen

    from dl_speech_enhancement_tpu.cli.export_checkpoint import main
    from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint
    from test_torch_import import _small_config

    config = _small_config()
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = gen.init(jax.random.PRNGKey(9))
    disc = HiFiGANDiscriminator(**{
        "scales": config["discriminator_params"]["scales"],
        "scale_discriminator_params":
            config["discriminator_params"]["scale_discriminator_params"],
        "follow_official_norm": True,
        "periods": tuple(config["discriminator_params"]["periods"]),
        "period_discriminator_params":
            config["discriminator_params"]["period_discriminator_params"]})
    params_d = disc.init(jax.random.PRNGKey(10))

    ckpt = str(tmp_path / "checkpoint-55steps")
    save_checkpoint(ckpt, {"params_generator": params, "vq_state": vq_state,
                           "params_discriminator": params_d, "steps": 55,
                           "epochs": 2}, config=config)

    out = str(tmp_path / "exported" / "checkpoint-55steps.pkl")
    main(["--checkpoint", ckpt, "--out", out])
    pkl = torch.load(out, map_location="cpu", weights_only=False)
    assert pkl["steps"] == 55 and pkl["epochs"] == 2
    assert set(pkl["model"]) == {"generator", "discriminator"}

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    tg.load_state_dict(pkl["model"]["generator"], strict=True)
    tg.eval()
    x = rng.standard_normal((1, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        e_t = tg.encoder(torch.tensor(x.transpose(0, 2, 1)))
        zq_t, _ = tg.quantizer.inference(tg.projector(e_t))
        y_t = tg.decoder(zq_t).numpy()
    e = gen.encoder(params["encoder"], jnp.asarray(x))
    zq, _ = gen.quantizer.inference(vq_state,
                                    gen.projector(params["projector"], e))
    y = gen.decoder(params["decoder"], zq)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)

    # course format from the same checkpoint
    out2 = str(tmp_path / "exported" / "course.pkl")
    main(["--checkpoint", ckpt, "--out", out2, "--format", "course"])
    sd = torch.load(out2, map_location="cpu", weights_only=False)
    tg2 = TorchGen(input_channels=1, output_channels=1, mode="causal",
                   **SMALL)
    tg2.load_state_dict(sd, strict=True)


@requires_reference
def test_export_univnet_discriminator(rng):
    """MRSD+MPD export: strict load into the reference combo (incl. the
    per-resolution window buffers) + MPD forward numerics."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.UnivNet import Discriminator as TorchDisc

    from dl_speech_enhancement_tpu.models import UnivNetDiscriminator
    from dl_speech_enhancement_tpu.utils.torch_export import (
        export_univnet_discriminator,
    )

    sd_kw = {"channels": 8, "kernel_sizes": [[3, 3], [3, 3], [3, 3]],
             "strides": [[1, 1], [1, 2], [1, 2]], "bias": True}
    p_kw = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32}
    ours = UnivNetDiscriminator(
        fft_sizes=(64, 128), hop_sizes=(16, 32), win_lengths=(64, 128),
        spectral_discriminator_params=sd_kw,
        periods=(2, 3), period_discriminator_params=p_kw)
    params = ours.init(jax.random.PRNGKey(11))
    sd = export_univnet_discriminator(params, ours)

    td = TorchDisc(
        fft_sizes=[64, 128], hop_sizes=[16, 32], win_lengths=[64, 128],
        spectral_discriminator_params={
            **sd_kw, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2}},
        periods=[2, 3],
        period_discriminator_params={
            **p_kw, "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True, "use_spectral_norm": False},
    )
    td.load_state_dict(_to_torch(sd), strict=True)
    td.eval()
    for i, d in enumerate(td.mrsd.discriminators):
        np.testing.assert_allclose(
            d.window.numpy(),
            np.asarray(ours.mrsd.discriminators[i].window), atol=1e-6)

    x = rng.standard_normal((2, 1, 90)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = td.mpd(torch.tensor(x))
    got = ours.mpd(params["mpd"], jnp.asarray(x.transpose(0, 2, 1)))
    for g_outs, r_outs in zip(got, ref):
        for g, r in zip(g_outs, r_outs):
            r, g = r.numpy(), np.asarray(g)
            if g.ndim == 4:
                g = g.transpose(0, 3, 1, 2)
            np.testing.assert_allclose(g.reshape(r.shape), r, atol=2e-5)
