"""Golden tests for the reference-checkpoint importer.

``utils/torch_import.py`` maps the reference's torch ``state_dict``s (both
pickle formats, SURVEY.md §5.4) onto our functional param trees by key name.
These tests build the reference's *own* torch modules, push their
state_dicts through the importer, and require numerical agreement of the
forwards — i.e. a reference user's trained checkpoint keeps its exact
behavior after import.
"""

import os

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
    UnivNetDiscriminator,
)
from dl_speech_enhancement_tpu.utils.torch_import import (
    import_audiodec_generator,
    import_hifigan_discriminator,
    import_hifigan_generator,
    import_univnet_discriminator,
)

from conftest import SMALL_TOPOLOGY as SMALL
from conftest import stub_torchaudio as _stub_torchaudio


@requires_reference
def test_import_audiodec_generator_pqc(rng):
    add_reference_to_path()
    from models.autoencoder.AudioDec import Generator as TorchGen

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    tg.eval()
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vq_state = import_audiodec_generator(tg.state_dict(), gen)
    assert vq_state is not None

    x = rng.standard_normal((2, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        e_t = tg.encoder(torch.tensor(x.transpose(0, 2, 1)))
        z_t = tg.projector(e_t)
        zq_t, _ = tg.quantizer.inference(z_t)
        y_t = tg.decoder(zq_t).numpy()
    e = gen.encoder(params["encoder"], jnp.asarray(x))
    z = gen.projector(params["projector"], e)
    zq, _ = gen.quantizer.inference(vq_state, z)
    y = gen.decoder(params["decoder"], zq)
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1), z_t.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_import_audiodec_generator_without_pqc(rng):
    """The course's without-PQC pickle still carries projector/quantizer
    entries (the reference constructs them unused) — the importer must skip
    them and produce our leaner tree."""
    add_reference_to_path()
    from models.autoencoder_without_PQC.AudioDec import Generator as TorchGen

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    tg.eval()
    sd = tg.state_dict()
    assert any(k.startswith("projector.") for k in sd)  # unused but present
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    params, vq_state = import_audiodec_generator(sd, gen)
    assert vq_state is None
    assert "projector" not in params and "conv1" not in params["decoder"]

    x = rng.standard_normal((2, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        y_t = tg(torch.tensor(x.transpose(0, 2, 1))).numpy()
    y, *_ = gen(params, None, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_import_hifigan_generator_with_stats(rng, tmp_path):
    """Weight-normed vocoder checkpoint + input-norm stats buffers."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    stats = rng.standard_normal((2, 16)).astype(np.float32)
    stats[1] = np.abs(stats[1]) + 0.5  # scale must be positive
    stats_path = str(tmp_path / "stats.npy")
    np.save(stats_path, stats)

    kw = dict(in_channels=16, out_channels=1, channels=64, kernel_size=7,
              upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
              resblock_kernel_sizes=(3, 7), groups=1, bias=True,
              use_additional_convs=True)
    tg = TorchHiFiGAN(**kw, resblock_dilations=[(1, 3), (1, 3)],
                      use_weight_norm=True, stats=stats_path)
    tg.eval()

    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3), (1, 3)))
    params, got_stats = import_hifigan_generator(tg.state_dict(), ours)
    np.testing.assert_allclose(got_stats, stats, atol=0)
    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3), (1, 3)),
                            stats=got_stats)

    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_import_hifigan_grouped_fast_decoder(rng):
    """AudioDec-v1 grouped fast-decoder form (MultiGroupConv1d + conv_out)."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    kw = dict(in_channels=16, out_channels=1, channels=64, kernel_size=7,
              upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
              resblock_kernel_sizes=(11,), groups=3, bias=True,
              use_additional_convs=True)
    tg = TorchHiFiGAN(**kw, resblock_dilations=[(1, 3, 5)],
                      use_weight_norm=True, stats=None)
    tg.eval()
    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3, 5),))
    params, got_stats = import_hifigan_generator(tg.state_dict(), ours)
    assert got_stats is None

    c = rng.standard_normal((2, 16, 15)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)


@requires_reference
def test_import_hifigan_discriminator(rng):
    """MSD+MPD combo: every imported feature map must match upstream."""
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
    td.eval()
    ours = HiFiGANDiscriminator(
        scales=2, scale_discriminator_params=s_kw, follow_official_norm=True,
        periods=(2, 3), period_discriminator_params=p_kw)
    params = import_hifigan_discriminator(td.state_dict(), ours)

    x = rng.standard_normal((2, 1, 240)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = td(torch.tensor(x))
    got = ours(params, jnp.asarray(x.transpose(0, 2, 1)))
    assert len(got) == len(ref)
    for g_outs, r_outs in zip(got, ref):
        assert len(g_outs) == len(r_outs)
        for g, r in zip(g_outs, r_outs):
            r, g = r.numpy(), np.asarray(g)
            if g.ndim == 4:
                g = g.transpose(0, 3, 1, 2)
            elif g.ndim == 3:
                g = g.transpose(0, 2, 1)
            np.testing.assert_allclose(g.reshape(r.shape), r, atol=2e-5)


@requires_reference
def test_import_univnet_discriminator_structure(rng):
    """MRSD+MPD import validates vs our init tree (the MRSD forward needs a
    spectrogram the torch side can't run without torchaudio here, so this
    pins structure + the MPD numerics only)."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.UnivNet import Discriminator as TorchDisc

    sd_kw = {"channels": 8, "kernel_sizes": [[3, 3], [3, 3], [3, 3]],
             "strides": [[1, 1], [1, 2], [1, 2]], "bias": True}
    p_kw = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32}
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
    ours = UnivNetDiscriminator(
        fft_sizes=(64, 128), hop_sizes=(16, 32), win_lengths=(64, 128),
        spectral_discriminator_params=sd_kw,
        periods=(2, 3), period_discriminator_params=p_kw)
    params = import_univnet_discriminator(td.state_dict(), ours)

    # MPD sub-path numerics (shared code with the HiFiGAN combo)
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


@requires_reference
def test_import_rejects_topology_mismatch():
    add_reference_to_path()
    from models.autoencoder.AudioDec import Generator as TorchGen

    tg = TorchGen(input_channels=1, output_channels=1, mode="causal", **SMALL)
    wrong = AudioDecGenerator(**dict(SMALL, encode_channels=16), use_pqc=True)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_audiodec_generator(tg.state_dict(), wrong)


# ------------------------------------------------------------------ CLI e2e

def _small_config(model_type="symAudioDec"):
    return {
        "model_type": model_type,
        "train_mode": "autoencoder",
        "sampling_rate": 48000,
        "generator_params": dict(
            input_channels=1, output_channels=1, mode="causal", **SMALL),
        "discriminator_params": {
            "scales": 2,
            "scale_discriminator_params": {
                "in_channels": 1, "out_channels": 1,
                "kernel_sizes": [15, 41, 5, 3], "channels": 16,
                "max_downsample_channels": 64, "max_groups": 16,
                "downsample_scales": [2, 2, 1]},
            "follow_official_norm": True,
            "periods": [2, 3],
            "period_discriminator_params": {
                "in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
                "channels": 8, "downsample_scales": [3, 3, 1],
                "max_downsample_channels": 32},
        },
    }


@requires_reference
def test_import_checkpoint_cli_framework_format(rng, tmp_path):
    """Reference framework-format pickle -> orbax, loadable, same forward."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.autoencoder.AudioDec import Generator as TorchGen
    from models.vocoder.HiFiGAN import Discriminator as TorchDisc

    from dl_speech_enhancement_tpu.cli.import_checkpoint import main
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.utils.config import save_config

    config = _small_config()
    tg = TorchGen(**config["generator_params"], **{})
    tg.eval()
    td = TorchDisc(
        scales=2,
        scale_discriminator_params={
            **config["discriminator_params"]["scale_discriminator_params"],
            "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1}},
        periods=[2, 3],
        period_discriminator_params={
            **config["discriminator_params"]["period_discriminator_params"],
            "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True, "use_spectral_norm": False},
    )

    pkl = str(tmp_path / "checkpoint-123steps.pkl")
    torch.save({"model": {"generator": tg.state_dict(),
                          "discriminator": td.state_dict()},
                "optimizer": {}, "scheduler": {},
                "steps": 123, "epochs": 4}, pkl)
    cfg_path = str(tmp_path / "config.yaml")
    save_config(cfg_path, config)
    out = str(tmp_path / "imported" / "checkpoint-123steps")
    main(["--checkpoint", pkl, "--config", cfg_path, "--out", out])

    state = load_checkpoint(out)
    assert int(state["steps"]) == 123 and int(state["epochs"]) == 4
    assert {"params_generator", "params_discriminator",
            "vq_state"} <= set(state)
    assert os.path.exists(os.path.join(os.path.dirname(out), "config.yml"))

    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    from dl_speech_enhancement_tpu.nn.vq import VQState
    vq = state["vq_state"]
    vq_state = (VQState(**{k: jnp.asarray(v) for k, v in vq.items()})
                if isinstance(vq, dict) else VQState(*vq))
    x = rng.standard_normal((1, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        e_t = tg.encoder(torch.tensor(x.transpose(0, 2, 1)))
        zq_t, _ = tg.quantizer.inference(tg.projector(e_t))
        y_t = tg.decoder(zq_t).numpy()
    p = state["params_generator"]
    e = gen.encoder(p["encoder"], jnp.asarray(x))
    zq, _ = gen.quantizer.inference(vq_state, gen.projector(p["projector"], e))
    y = gen.decoder(p["decoder"], zq)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_import_checkpoint_cli_course_format(rng, tmp_path):
    """Bare without-PQC state_dict (course format) -> params_generator only."""
    add_reference_to_path()
    from models.autoencoder_without_PQC.AudioDec import Generator as TorchGen

    from dl_speech_enhancement_tpu.cli.import_checkpoint import main
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.utils.config import save_config

    config = _small_config()
    tg = TorchGen(**config["generator_params"])
    tg.eval()
    pkl = str(tmp_path / "TESTcheckpoint-7.pkl")
    torch.save(tg.state_dict(), pkl)
    cfg_path = str(tmp_path / "config.yaml")
    save_config(cfg_path, config)
    out = str(tmp_path / "imported" / "checkpoint-7")
    main(["--checkpoint", pkl, "--config", cfg_path, "--out", out,
          "--without-pqc"])

    state = load_checkpoint(out)
    assert set(state) == {"params_generator"}
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    x = rng.standard_normal((1, 240, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        y_t = tg(torch.tensor(x.transpose(0, 2, 1))).numpy()
    y, *_ = gen(state["params_generator"], None, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_t,
                               atol=1e-4)


@requires_reference
def test_import_hifigan_generator_no_additional_convs(rng):
    """use_additional_convs=False checkpoints carry no convs2 keys at all;
    the importer must omit the key (our init tree does) rather than emit an
    empty list that fails the like-tree structure check."""
    add_reference_to_path()
    _stub_torchaudio()
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN

    kw = dict(in_channels=16, out_channels=1, channels=64, kernel_size=7,
              upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
              resblock_kernel_sizes=(3, 7), groups=1, bias=True,
              use_additional_convs=False)
    tg = TorchHiFiGAN(**kw, resblock_dilations=[(1, 3), (1, 3)],
                      use_weight_norm=True, stats=None)
    tg.eval()

    ours = HiFiGANGenerator(**kw, resblock_dilations=((1, 3), (1, 3)))
    params, got_stats = import_hifigan_generator(tg.state_dict(), ours)
    assert got_stats is None
    # structural agreement with our init tree (what load_checkpoint checks)
    like = ours.init(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(like))

    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(c)).numpy()
    got = np.asarray(ours(params, jnp.asarray(c.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-5)
