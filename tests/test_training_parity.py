"""Training-DYNAMICS parity vs the reference torch loops.

The strongest available proxy for the DNSMOS north star without the corpus:
transplant one identical init into the reference torch training code and into
our jitted steps, feed both the SAME batches for N optimizer steps, and
require the per-step loss trajectories to agree.

Covered workloads (each drives the reference's own trainer code, not a
re-implementation of it):

- course loop        -> train_denoise.py:213-263 model_step (replicated
                        verbatim from its source here because that file is a
                        module-level script with ClearML/argparse side
                        effects; the models/criterions are upstream's)
- autoencoder        -> trainer/autoencoder.py Trainer._train_step
                        (stage 1 EMA-VQ + stage 2 frozen-encoder adversarial)
- vocoder            -> trainer/vocoder.py Trainer._train_step
- denoise            -> trainer/denoise.py Trainer._train_step

Upstream imports need three stubs for packages absent from this image:
torchaudio (unused paths), tensorboardX (no-op writer), librosa (only
``filters.mel`` — backed by our independently-tested Slaney filterbank).

Deviations toggled to reference-compatible mode for the comparison:
``compat_adv_on_waveform=True`` reproduces train_denoise.py:147 feeding the
raw waveform to gen_adv; noise dropout / mixing happen outside the compared
steps (identical batches are fed directly).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from conftest import requires_reference, add_reference_to_path
from test_upstream_parity import (
    _stub_torchaudio, conv_w, conv_b, deconv_w, conv_w_raw,
    wn_conv_params, wn_deconv_params,
)

from dl_speech_enhancement_tpu.nn.vq import VQState


def _stub_tensorboardx():
    if "tensorboardX" in sys.modules:
        return
    tbx = types.ModuleType("tensorboardX")

    class SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def close(self):
            pass

    tbx.SummaryWriter = SummaryWriter
    sys.modules["tensorboardX"] = tbx


def _stub_librosa():
    if "librosa" in sys.modules:
        return
    from dl_speech_enhancement_tpu.dsp.mel import mel_filterbank

    lib = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")

    def mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, **kw):
        fmax = sr / 2 if fmax is None else fmax
        # ours is (freq, mels); librosa returns (mels, freq)
        return np.asarray(
            mel_filterbank(sr, n_fft, n_mels, float(fmin), float(fmax))
        ).T.astype(np.float32)

    filters.mel = mel
    lib.filters = filters
    sys.modules["librosa"] = lib
    sys.modules["librosa.filters"] = filters


def _stub_all():
    add_reference_to_path()
    _stub_torchaudio()
    _stub_tensorboardx()
    _stub_librosa()
    # deterministic torch inits: trajectories (and the descent sanity
    # asserts) must not depend on process entropy or test ordering
    torch.manual_seed(0)


# ---------------------------------------------------------------- topologies

AD_KW_TORCH = dict(input_channels=1, output_channels=1, encode_channels=8,
                   decode_channels=8, code_dim=16, codebook_num=2,
                   codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
                   enc_strides=(3, 4), dec_strides=(4, 3), mode="causal")
AD_KW_OURS = dict(encode_channels=8, decode_channels=8, code_dim=16,
                  codebook_num=2, codebook_size=32, enc_ratios=(2, 4),
                  dec_ratios=(4, 2), enc_strides=(3, 4), dec_strides=(4, 3))
HOP = 12
T = HOP * 20  # 240 samples per clip

MSD_KW = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [15, 41, 5, 3],
          "channels": 8, "max_downsample_channels": 32, "max_groups": 4,
          "downsample_scales": [2, 2, 1]}
MPD_KW = {"in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
          "channels": 4, "downsample_scales": [3, 3, 1],
          "max_downsample_channels": 16}

MEL_KW = dict(fs=2400, fft_sizes=[64], hop_sizes=[16], win_lengths=[64],
              num_mels=10, fmin=0, fmax=1200, log_base=None)


def _torch_disc():
    from models.vocoder.HiFiGAN import Discriminator as TorchDisc

    return TorchDisc(
        scales=2,
        scale_discriminator_params={
            **MSD_KW, "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
        },
        follow_official_norm=True,
        periods=[2, 3],
        period_discriminator_params={
            **MPD_KW, "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True, "use_spectral_norm": False,
        },
    )


def _our_disc():
    from dl_speech_enhancement_tpu.models import HiFiGANDiscriminator

    return HiFiGANDiscriminator(
        scales=2, scale_discriminator_params=MSD_KW,
        periods=(2, 3), period_discriminator_params=MPD_KW,
    )


# ------------------------------------------------------------- transplanting

def _deep_copy(tree):
    """Force-copy every leaf: jnp.asarray of a contiguous torch .numpy()
    view can ALIAS torch storage on the CPU backend, so torch's in-place
    optimizer updates would silently mutate the transplanted params."""
    return jax.tree_util.tree_map(lambda a: jnp.array(np.array(a)), tree)


def _wn_conv2d(m):
    return {
        "v": jnp.asarray(m.weight_v.detach().numpy().transpose(2, 3, 1, 0)),
        "g": jnp.asarray(m.weight_g.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(m.bias.detach().numpy()),
    }


def _plain_conv1d(m):
    return {"w": conv_w_raw(m.weight), "b": conv_b(m)}


def disc_params_from_torch(tdisc):
    """torch HiFiGAN combo Discriminator -> our param pytree."""
    msd = {"discriminators": []}
    for d in tdisc.msd.discriminators:
        layers = []
        for layer in d.layers:
            conv = layer[0] if isinstance(layer, torch.nn.Sequential) else layer
            layers.append(_plain_conv1d(conv))
        msd["discriminators"].append({"layers": layers})
    mpd = {"discriminators": []}
    for d in tdisc.mpd.discriminators:
        mpd["discriminators"].append({
            "convs": [_wn_conv2d(seq[0]) for seq in d.convs],
            "output_conv": _wn_conv2d(d.output_conv),
        })
    return _deep_copy({"msd": msd, "mpd": mpd})


def _res_unit_params(tu):
    return {"conv1": {"w": conv_w(tu.conv1.conv)},
            "conv2": {"w": conv_w_raw(tu.conv2.weight)}}


def audiodec_params_from_torch(tg, use_pqc=True):
    """torch AudioDec generator -> (our params, VQState incl. EMA buffers)."""
    enc = {"conv": {"w": conv_w(tg.encoder.conv.conv)}, "blocks": []}
    for blk in tg.encoder.conv_blocks:
        enc["blocks"].append({
            "res": [_res_unit_params(u) for u in blk.res_units],
            "conv": {"w": conv_w(blk.conv.conv), "b": conv_b(blk.conv.conv)},
        })
    dec = {"blocks": [], "conv2": {"w": conv_w(tg.decoder.conv2.conv)}}
    if use_pqc:
        dec["conv1"] = {"w": conv_w(tg.decoder.conv1.conv)}
    for blk in tg.decoder.conv_blocks:
        dec["blocks"].append({
            "conv": {"w": deconv_w(blk.conv.deconv), "b": conv_b(blk.conv.deconv)},
            "res": [_res_unit_params(u) for u in blk.res_units],
        })
    params = {"encoder": enc, "decoder": dec}
    vq_state = None
    if use_pqc:
        params["projector"] = {"conv": {"w": conv_w(tg.projector.project.conv)}}
        layers = tg.quantizer.codebook.layers
        vq_state = VQState(
            jnp.asarray(np.stack([l.embed.numpy() for l in layers])),
            jnp.asarray(np.stack([l.cluster_size.numpy() for l in layers])),
            jnp.asarray(np.stack([l.embed_avg.numpy() for l in layers])),
        )
    return _deep_copy(params), _deep_copy(vq_state)


def hifigan_params_from_torch(tg):
    def resblock_params(tb):
        return {"convs1": [wn_conv_params(c.conv) for c in tb.convs1],
                "convs2": [wn_conv_params(c.conv) for c in tb.convs2]}

    params = {
        "input_conv": wn_conv_params(tg.input_conv.conv),
        "upsamples": [wn_deconv_params(u.deconv) for u in tg.upsamples],
        "blocks": [
            {"blocks": [resblock_params(b) for b in blk.blocks]}
            for blk in tg.blocks
        ],
        "output_conv": wn_conv_params(tg.output_conv.conv),
    }
    return _deep_copy(params)


def _batches(rng, n, b=2, t=T, pair=False):
    out = []
    for _ in range(n):
        x = rng.standard_normal((b, 1, t)).astype(np.float32) * 0.3
        if pair:
            y = (x + 0.1 * rng.standard_normal((b, 1, t)).astype(np.float32))
            out.append((x, y))
        else:
            out.append(x)
    return out


def _snr_torch(pred, target):
    """torchmetrics SignalNoiseRatio semantics over the whole batch (the
    formula used by our losses.metrics.signal_noise_ratio)."""
    eps = float(np.finfo(np.float32).eps)
    noise = target - pred
    return 10.0 * (torch.log10(torch.sum(target ** 2) + eps)
                   - torch.log10(torch.sum(noise ** 2) + eps))


def _dummy_tqdm():
    return types.SimpleNamespace(update=lambda n: None, close=lambda: None)


def _const_scheduler(opt):
    return torch.optim.lr_scheduler.LambdaLR(opt, lambda step: 1.0)


# ---------------------------------------------------------------- the tests


@requires_reference
def test_course_loop_training_parity(rng, tmp_path):
    """train_denoise.py model_step (mel + SNR [+ adv + feat-match]) vs
    make_course_steps over 11 identical steps (disc gate opens at step 6)."""
    _stub_all()
    from models.autoencoder_without_PQC.AudioDec import Generator as TorchGen
    from losses import (
        MultiMelSpectrogramLoss as TorchMel,
        GeneratorAdversarialLoss as TorchGenAdv,
        DiscriminatorAdversarialLoss as TorchDisAdv,
        FeatureMatchLoss as TorchFM,
    )
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    tgen = TorchGen(**AD_KW_TORCH)
    tdisc = _torch_disc()
    gen = AudioDecGenerator(**AD_KW_OURS, use_pqc=False)
    disc = _our_disc()
    params_g, _ = audiodec_params_from_torch(tgen, use_pqc=False)
    params_d = disc_params_from_torch(tdisc)

    config = dict(
        mel_loss_params=MEL_KW, lambda_mel_loss=45.0, lambda_snr_loss=1.0,
        lambda_adv=1.0, lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
        compat_adv_on_waveform=True,  # reference train_denoise.py:147
    )
    g_clip, d_clip = 1.0, 1.0  # symAD_custom.yaml:155,169

    # ---- torch side: model_step replicated from train_denoise.py:118-263
    tmel = TorchMel(**MEL_KW)
    tga = TorchGenAdv(average_by_discriminators=False)
    tda = TorchDisAdv(average_by_discriminators=False)
    tfm = TorchFM()
    opt_tg = torch.optim.Adam(tgen.parameters(), lr=1e-3, betas=(0.5, 0.9))
    opt_td = torch.optim.Adam(tdisc.parameters(), lr=2e-4, betas=(0.5, 0.9))

    def torch_step(x, target, disc_on):
        y = tgen(x)
        mel = 45.0 * tmel(y, target)
        snr = 1.0 * (1 - torch.sigmoid(_snr_torch(y, target)))
        gen_loss = mel + snr
        if disc_on:
            p_ = tdisc(y)
            with torch.no_grad():
                p = tdisc(target)
            gen_loss = gen_loss + 1.0 * tga(y) + 2.0 * tfm(p_, p)
        opt_tg.zero_grad()
        gen_loss.backward()
        torch.nn.utils.clip_grad_norm_(tgen.parameters(), g_clip)
        opt_tg.step()
        dis_loss = torch.tensor(0.0)
        if disc_on:
            with torch.no_grad():
                y2 = tgen(x)
            p = tdisc(target)
            p_ = tdisc(y2.detach())
            real, fake = tda(p_, p)
            dis_loss = 1.0 * (real + fake)
            opt_td.zero_grad()
            dis_loss.backward()
            torch.nn.utils.clip_grad_norm_(tdisc.parameters(), d_clip)
            opt_td.step()
        return float(gen_loss), float(dis_loss)

    # ---- our side
    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=g_clip)
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]},
                            grad_norm=d_clip)
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    steps = make_course_steps(gen, disc, config, opt_g, opt_d)

    batches = _batches(rng, 11, pair=True)
    ref, got = [], []
    for i, (noisy, clean) in enumerate(batches):
        disc_on = i >= 6
        ref.append(torch_step(torch.from_numpy(noisy),
                              torch.from_numpy(clean), disc_on))
        fn = steps["train_disc" if disc_on else "train"]
        state, g_l, d_l, _, _ = fn(
            state, jnp.asarray(noisy.transpose(0, 2, 1)),
            jnp.asarray(clean.transpose(0, 2, 1)))
        got.append((float(g_l), float(d_l)))

    ref = np.asarray(ref)
    got = np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-4)
    # the trajectory must actually descend (both frameworks)
    assert ref[5][0] < ref[0][0]
    assert got[5][0] < got[0][0]


@requires_reference
def test_autoencoder_trainer_parity(rng, tmp_path):
    """trainer/autoencoder.py Trainer._train_step (the real reference class)
    vs make_autoencoder_steps: stage 1 (EMA VQ training) then stage 2
    (frozen encoder/projector/codebook + adversarial)."""
    _stub_all()
    from models.autoencoder.AudioDec import Generator as TorchGen
    from trainer.autoencoder import Trainer as TorchTrainer
    from losses import (
        MultiMelSpectrogramLoss as TorchMel,
        GeneratorAdversarialLoss as TorchGenAdv,
        DiscriminatorAdversarialLoss as TorchDisAdv,
        FeatureMatchLoss as TorchFM,
    )
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.workloads.autoencoder import (
        make_autoencoder_steps,
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    tgen = TorchGen(**AD_KW_TORCH)
    tdisc = _torch_disc()
    gen = AudioDecGenerator(**AD_KW_OURS, use_pqc=True)
    disc = _our_disc()
    params_g, vq_state = audiodec_params_from_torch(tgen, use_pqc=True)
    params_d = disc_params_from_torch(tdisc)

    disc_start = 5
    config = dict(
        outdir=str(tmp_path), train_max_steps=10 ** 9, paradigm="efficient",
        start_steps={"generator": 0, "discriminator": disc_start},
        use_mel_loss=True, mel_loss_params=MEL_KW, lambda_mel_loss=45.0,
        use_stft_loss=False, use_shape_loss=False, lambda_vq_loss=1.0,
        use_feat_match_loss=True, lambda_feat_match=2.0, lambda_adv=1.0,
        generator_grad_norm=0.5,  # exercises clip-over-trainable-only
        discriminator_grad_norm=-1,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
    )

    opt_tg = torch.optim.Adam(tgen.parameters(), lr=1e-3, betas=(0.5, 0.9))
    opt_td = torch.optim.Adam(tdisc.parameters(), lr=2e-4, betas=(0.5, 0.9))
    trainer = TorchTrainer(
        steps=0, epochs=0, data_loader=None,
        model={"generator": tgen, "discriminator": tdisc},
        criterion={"mel": TorchMel(**MEL_KW),
                   "gen_adv": TorchGenAdv(average_by_discriminators=False),
                   "dis_adv": TorchDisAdv(average_by_discriminators=False),
                   "feat_match": TorchFM()},
        optimizer={"generator": opt_tg, "discriminator": opt_td},
        scheduler={"generator": _const_scheduler(opt_tg),
                   "discriminator": _const_scheduler(opt_td)},
        config=config,
    )
    trainer.tqdm = _dummy_tqdm()

    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=0.5)
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]})
    state = {
        "params_generator": params_g,
        "params_discriminator": params_d,
        "vq_state": vq_state,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    fns = make_autoencoder_steps(gen, disc, config, opt_g, opt_d)

    def torch_losses_after(step_fn, batch):
        before = dict(trainer.total_train_loss)
        step_fn(batch)
        return {k: trainer.total_train_loss[k] - before.get(k, 0.0)
                for k in trainer.total_train_loss}

    batches = _batches(rng, 9)
    probe = jnp.asarray(batches[0].transpose(0, 2, 1))
    probe_start = float(fns["eval_stage1"](state, probe)[0]["generator_loss"])
    ref_g, ref_d, got_g, got_d = [], [], [], []
    for i, x in enumerate(batches):
        deltas = torch_losses_after(trainer._train_step, torch.from_numpy(x))
        ref_g.append(deltas["train/generator_loss"])
        ref_d.append(deltas.get("train/discriminator_loss", 0.0))

        xj = jnp.asarray(x.transpose(0, 2, 1))
        if i < disc_start:
            state, frags, _ = fns["gen_stage1"](state, xj)
            got_d.append(0.0)
        else:
            state, frags, _ = fns["gen_stage2"](state, xj)
            state, dfrags = fns["dis"](state, xj)
            got_d.append(float(dfrags["discriminator_loss"]))
        got_g.append(float(frags["generator_loss"]))

    np.testing.assert_allclose(got_g, ref_g, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(got_d, ref_d, rtol=5e-3, atol=1e-4)
    # EMA codebooks must have tracked each other through stage 1
    embeds = np.stack([l.embed.numpy()
                       for l in tgen.quantizer.codebook.layers])
    np.testing.assert_allclose(np.asarray(state["vq_state"].embed), embeds,
                               rtol=1e-3, atol=1e-5)
    # training progress: loss on a FIXED probe batch must have dropped
    # (per-step losses above are on different batches, so not comparable)
    frags_end, _ = fns["eval_stage1"](state, probe)
    assert float(frags_end["generator_loss"]) < probe_start


@requires_reference
def test_vocoder_trainer_parity(rng, tmp_path):
    """trainer/vocoder.py Trainer._train_step (frozen analyzer -> HiFiGAN
    generator + discriminator) vs make_vocoder_steps."""
    _stub_all()
    from models.autoencoder.AudioDec import Generator as TorchAD
    from models.vocoder.HiFiGAN import Generator as TorchHiFiGAN
    from trainer.vocoder import Trainer as TorchTrainer
    from losses import (
        MultiMelSpectrogramLoss as TorchMel,
        GeneratorAdversarialLoss as TorchGenAdv,
        DiscriminatorAdversarialLoss as TorchDisAdv,
        FeatureMatchLoss as TorchFM,
    )
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANGenerator,
    )
    from dl_speech_enhancement_tpu.train.workloads.vocoder import (
        make_vocoder_steps,
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    tanalyzer = TorchAD(**AD_KW_TORCH)
    hifigan_kw = dict(
        in_channels=16, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=[(1, 3)],
        groups=1, bias=True, use_additional_convs=True,
    )
    tvoc = TorchHiFiGAN(**hifigan_kw, use_weight_norm=True, stats=None)
    tdisc = _torch_disc()

    analyzer = AudioDecGenerator(**AD_KW_OURS, use_pqc=True)
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=16, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    disc = _our_disc()
    params_a, vq_state = audiodec_params_from_torch(tanalyzer, use_pqc=True)
    params_g = hifigan_params_from_torch(tvoc)
    params_d = disc_params_from_torch(tdisc)

    config = dict(
        outdir=str(tmp_path), train_max_steps=10 ** 9,
        generator_train_start_steps=0, discriminator_train_start_steps=0,
        use_mel_loss=True, mel_loss_params=MEL_KW, lambda_mel_loss=45.0,
        use_stft_loss=False, use_shape_loss=False,
        use_feat_match_loss=True, lambda_feat_match=2.0, lambda_adv=1.0,
        generator_grad_norm=-1, discriminator_grad_norm=-1,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
    )

    opt_tg = torch.optim.Adam(tvoc.parameters(), lr=1e-3, betas=(0.5, 0.9))
    opt_td = torch.optim.Adam(tdisc.parameters(), lr=2e-4, betas=(0.5, 0.9))
    trainer = TorchTrainer(
        steps=1,  # reference gating is strict '>' (vocoder.py:68,93)
        epochs=0, data_loader=None,
        model={"analyzer": tanalyzer, "generator": tvoc,
               "discriminator": tdisc},
        criterion={"mel": TorchMel(**MEL_KW),
                   "gen_adv": TorchGenAdv(average_by_discriminators=False),
                   "dis_adv": TorchDisAdv(average_by_discriminators=False),
                   "feat_match": TorchFM()},
        optimizer={"generator": opt_tg, "discriminator": opt_td},
        scheduler={"generator": _const_scheduler(opt_tg),
                   "discriminator": _const_scheduler(opt_td)},
        config=config,
    )
    trainer.tqdm = _dummy_tqdm()

    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]})
    opt_d = build_optimizer("Adam", {"lr": 2e-4, "betas": [0.5, 0.9]})
    state = {
        "params_analyzer": params_a,
        "vq_state": vq_state,
        "params_generator": params_g,
        "params_discriminator": params_d,
        "opt_generator": opt_g.init(params_g),
        "opt_discriminator": opt_d.init(params_d),
    }
    fns = make_vocoder_steps(analyzer, voc, disc, config, opt_g, opt_d)

    def torch_losses_after(batch):
        before = dict(trainer.total_train_loss)
        trainer._train_step(batch)
        return {k: trainer.total_train_loss[k] - before.get(k, 0.0)
                for k in trainer.total_train_loss}

    batches = _batches(rng, 6)
    ref_g, ref_d, got_g, got_d = [], [], [], []
    for x in batches:
        deltas = torch_losses_after(torch.from_numpy(x))
        ref_g.append(deltas["train/generator_loss"])
        ref_d.append(deltas["train/discriminator_loss"])
        xj = jnp.asarray(x.transpose(0, 2, 1))
        state, frags = fns["gen_adv"](state, xj)
        got_g.append(float(frags["generator_loss"]))
        state, dfrags = fns["dis"](state, xj)
        got_d.append(float(dfrags["discriminator_loss"]))

    np.testing.assert_allclose(got_g, ref_g, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(got_d, ref_d, rtol=5e-3, atol=1e-4)
    assert ref_g[-1] < ref_g[0] and got_g[-1] < got_g[0]


@requires_reference
def test_denoise_trainer_parity(rng, tmp_path):
    """trainer/denoise.py Trainer._train_step (encoder fine-tune on
    (noisy, clean) pairs, frozen quantizer/decoder) vs make_denoise_steps."""
    _stub_all()
    from models.autoencoder.AudioDec import Generator as TorchGen
    from trainer.denoise import Trainer as TorchTrainer
    from losses import MultiMelSpectrogramLoss as TorchMel
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.workloads.denoise import (
        make_denoise_steps,
    )
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    tgen = TorchGen(**AD_KW_TORCH)
    gen = AudioDecGenerator(**AD_KW_OURS, use_pqc=True)
    params_g, vq_state = audiodec_params_from_torch(tgen, use_pqc=True)

    config = dict(
        outdir=str(tmp_path), train_max_steps=10 ** 9,
        use_mel_loss=True, mel_loss_params=MEL_KW, lambda_mel_loss=45.0,
        use_stft_loss=False, use_shape_loss=False, lambda_vq_loss=1.0,
        generator_grad_norm=0.5, discriminator_grad_norm=-1,
    )

    opt_tg = torch.optim.Adam(
        [p for p in tgen.parameters() if True], lr=1e-3, betas=(0.5, 0.9))
    trainer = TorchTrainer(
        steps=0, epochs=0, data_loader=None,
        model={"generator": tgen, "discriminator": torch.nn.Linear(1, 1)},
        criterion={"mel": TorchMel(**MEL_KW)},
        optimizer={"generator": opt_tg,
                   "discriminator": torch.optim.Adam(
                       torch.nn.Linear(1, 1).parameters())},
        scheduler={"generator": _const_scheduler(opt_tg),
                   "discriminator": None},
        config=config,
    )
    trainer.tqdm = _dummy_tqdm()

    opt_g = build_optimizer("Adam", {"lr": 1e-3, "betas": [0.5, 0.9]},
                            grad_norm=0.5)
    state = {
        "params_generator": params_g,
        "vq_state": vq_state,
        "opt_generator": opt_g.init(params_g),
    }
    fns = make_denoise_steps(gen, config, opt_g)

    batches = _batches(rng, 8, pair=True)
    xp = jnp.asarray(batches[0][0].transpose(0, 2, 1))
    cp = jnp.asarray(batches[0][1].transpose(0, 2, 1))
    probe_start = float(fns["eval"](state, xp, cp)[0]["generator_loss"])
    ref_g, got_g = [], []
    for noisy, clean in batches:
        before = dict(trainer.total_train_loss)
        trainer._train_step((torch.from_numpy(noisy),
                             torch.from_numpy(clean)))
        ref_g.append(trainer.total_train_loss["train/generator_loss"]
                     - before.get("train/generator_loss", 0.0))
        state, frags, _ = fns["train"](
            state, jnp.asarray(noisy.transpose(0, 2, 1)),
            jnp.asarray(clean.transpose(0, 2, 1)))
        got_g.append(float(frags["generator_loss"]))

    np.testing.assert_allclose(got_g, ref_g, rtol=5e-3, atol=1e-4)
    # training progress on a FIXED probe pair (per-step batches differ)
    frags_end, _ = fns["eval"](state, xp, cp)
    assert float(frags_end["generator_loss"]) < probe_start
