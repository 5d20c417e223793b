"""End-to-end training tests: jitted steps run, losses decrease, checkpoints
round-trip, freezes hold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_speech_enhancement_tpu.models import (
    AudioDecGenerator,
    HiFiGANGenerator,
    HiFiGANDiscriminator,
)
from dl_speech_enhancement_tpu.train.workloads.autoencoder import (
    Trainer as AutoencoderTrainer,
)
from dl_speech_enhancement_tpu.train.workloads.denoise import (
    Trainer as DenoiseTrainer,
)
from dl_speech_enhancement_tpu.train.workloads.vocoder import (
    Trainer as VocoderTrainer,
)
from dl_speech_enhancement_tpu.train.workloads.statistic import compute_statistics
from dl_speech_enhancement_tpu.train.denoise_course import (
    make_course_steps, train_denoise_course,
)
from dl_speech_enhancement_tpu.train.optim import build_optimizer
from dl_speech_enhancement_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint,
)

SMALL = dict(
    encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
    codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
    enc_strides=(3, 4), dec_strides=(4, 3),
)

TINY_DISC = dict(
    scales=2,
    scale_discriminator_params={
        "kernel_sizes": [15, 41, 5, 3], "channels": 8,
        "max_downsample_channels": 32, "max_groups": 4,
        "downsample_scales": [2, 2, 1],
    },
    periods=(2, 3),
    period_discriminator_params={
        "kernel_sizes": [5, 3], "channels": 4,
        "downsample_scales": [3, 3, 1], "max_downsample_channels": 16,
    },
)

MEL_TINY = dict(fs=4800, fft_sizes=[256], hop_sizes=[60], win_lengths=[256],
                num_mels=20, fmin=0, fmax=2400, log_base=None)

BASE_CONFIG = dict(
    outdir=None,
    use_mel_loss=True,
    mel_loss_params=MEL_TINY,
    lambda_mel_loss=45.0,
    lambda_vq_loss=1.0,
    lambda_adv=1.0,
    lambda_feat_match=2.0,
    use_feat_match_loss=True,
    generator_adv_loss_params={"average_by_discriminators": False},
    discriminator_adv_loss_params={"average_by_discriminators": False},
    generator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
    discriminator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
    generator_grad_norm=-1,
    discriminator_grad_norm=-1,
    save_interval_steps=10**9,
    eval_interval_steps=10**9,
    log_interval_steps=10**9,
    train_max_steps=10,
    batch_size=2,
    seed=0,
)


def _sine_batch(rng, b=2, t=240):
    ph = rng.uniform(0, np.pi, (b, 1, 1))
    tt = np.arange(t)[None, :, None] / 48.0
    return (np.sin(2 * np.pi * tt + ph) * 0.5).astype(np.float32)


def test_autoencoder_trainer_stage1_loss_decreases(tmp_path, rng):
    config = dict(BASE_CONFIG, outdir=str(tmp_path),
                  start_steps={"generator": 0, "discriminator": 10**9})
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    batches = [_sine_batch(rng) for _ in range(8)]
    tr = AutoencoderTrainer(0, 0, {"train": batches}, gen, disc, config,
                            key=jax.random.PRNGKey(0))
    losses = []
    for b in batches:
        tr._train_step(b)
        losses.append(tr.total_train_loss["train/generator_loss"])
    per_step = np.diff([0] + losses)
    assert per_step[-1] < per_step[0], f"loss did not decrease: {per_step}"


def test_autoencoder_trainer_stage2_freezes_encoder(tmp_path, rng):
    config = dict(BASE_CONFIG, outdir=str(tmp_path),
                  start_steps={"generator": 0, "discriminator": 0})
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    b = _sine_batch(rng)
    tr = AutoencoderTrainer(0, 0, {"train": [b]}, gen, disc, config,
                            key=jax.random.PRNGKey(0))
    enc_before = jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["encoder"])
    vq_before = np.asarray(tr.state["vq_state"].embed)
    dec_before = jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["decoder"])
    disc_before = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr.state["params_discriminator"]))
    tr._train_step(b)
    enc_after = jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["encoder"])
    # encoder + VQ frozen; decoder + discriminator moved
    for x, y in zip(jax.tree_util.tree_leaves(enc_before),
                    jax.tree_util.tree_leaves(enc_after)):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(vq_before, np.asarray(tr.state["vq_state"].embed))
    moved = any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(dec_before),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(
                                np.asarray,
                                tr.state["params_generator"]["decoder"])))
    )
    assert moved
    disc_after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr.state["params_discriminator"]))
    assert any(not np.allclose(x, y) for x, y in zip(disc_before, disc_after))


def test_denoise_trainer_freezes_decoder_and_vq(tmp_path, rng):
    config = dict(BASE_CONFIG, outdir=str(tmp_path))
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    clean = _sine_batch(rng)
    noisy = clean + 0.1 * rng.standard_normal(clean.shape).astype(np.float32)
    tr = DenoiseTrainer(0, 0, {"train": [(noisy, clean)]}, gen, config,
                        key=jax.random.PRNGKey(1))
    dec_before = jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["decoder"])
    vq_before = np.asarray(tr.state["vq_state"].embed)
    enc_before = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["encoder"]))
    tr._train_step((noisy, clean))
    for x, y in zip(jax.tree_util.tree_leaves(dec_before),
                    jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                        np.asarray, tr.state["params_generator"]["decoder"]))):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(vq_before, np.asarray(tr.state["vq_state"].embed))
    enc_after = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        np.asarray, tr.state["params_generator"]["encoder"]))
    assert any(not np.allclose(x, y) for x, y in zip(enc_before, enc_after))


def test_vocoder_trainer_runs(tmp_path, rng):
    config = dict(BASE_CONFIG, outdir=str(tmp_path),
                  generator_train_start_steps=0,
                  discriminator_train_start_steps=0)
    analyzer = AudioDecGenerator(**SMALL, use_pqc=True)
    ap, vqs = analyzer.init(jax.random.PRNGKey(3))
    voc = HiFiGANGenerator(
        in_channels=16, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(4, 3), upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    disc = HiFiGANDiscriminator(**TINY_DISC)
    b = _sine_batch(rng)
    tr = VocoderTrainer(1, 0, {"train": [b]}, analyzer, ap, vqs, voc, disc,
                        config, key=jax.random.PRNGKey(4))
    ap_before = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, ap))
    tr._train_step(b)
    assert tr.total_train_loss["train/generator_loss"] != 0.0
    # analyzer untouched
    for x, y in zip(ap_before, jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, tr.state["params_analyzer"]))):
        np.testing.assert_array_equal(x, y)


def test_autoencoder_trainer_univnet_discriminator(tmp_path, rng):
    """symAudioDecUniv: UnivNet MRSD+MPD discriminator, adversarial phase —
    losses must stay finite (regression: sqrt-at-zero NaN in the spectral
    front-end)."""
    from dl_speech_enhancement_tpu.utils.model_factory import (
        build_generator, build_discriminator,
    )

    config = dict(BASE_CONFIG, outdir=str(tmp_path), use_feat_match_loss=True,
                  start_steps={"generator": 0, "discriminator": 0})
    gen = build_generator("symAudioDecUniv", SMALL)
    disc = build_discriminator("symAudioDecUniv", dict(
        fft_sizes=[512, 256], hop_sizes=[60, 30], win_lengths=[240, 120],
        spectral_discriminator_params={"channels": 4},
        periods=[2, 3],
        period_discriminator_params={"kernel_sizes": [5, 3], "channels": 4,
                                     "downsample_scales": [3, 3, 1],
                                     "max_downsample_channels": 16},
    ))
    batch = rng.standard_normal((2, 480, 1)).astype(np.float32)
    tr = AutoencoderTrainer(0, 0, {"train": [batch]}, gen, disc, config,
                            key=jax.random.PRNGKey(0))
    tr._train_step(batch)
    assert np.isfinite(tr.total_train_loss["train/generator_loss"])
    assert np.isfinite(tr.total_train_loss["train/discriminator_loss"])


def test_statistic_workload(rng):
    analyzer = AudioDecGenerator(**SMALL, use_pqc=True)
    ap, vqs = analyzer.init(jax.random.PRNGKey(5))
    clips = [rng.standard_normal((360, 1)).astype(np.float32) for _ in range(3)]
    stats = compute_statistics(analyzer, ap, vqs, clips)
    assert stats.shape == (2, 16)
    assert np.all(stats[1] > 0)


def test_course_loop_end_to_end(tmp_path, rng):
    config = dict(
        sample_rate=4800, epochs=2, epoch_to_enable_discriminator=1,
        noise_dropout_rate=0.5, noise_dropout_rate_decay=0.1,
        epoch_to_enable_noise_dropout_decay=0, seed=0, step=0,
        mel_loss_params=MEL_TINY, lambda_mel_loss=45.0, lambda_snr_loss=1.0,
        lambda_adv=1.0, lambda_feat_match=2.0,
        generator_adv_loss_params={"average_by_discriminators": False},
        discriminator_adv_loss_params={"average_by_discriminators": False},
        generator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
        discriminator_optimizer_params={"lr": 1e-3, "betas": [0.5, 0.9]},
        generator_grad_norm=-1, discriminator_grad_norm=-1,
        batch_size=2,
    )
    gen = AudioDecGenerator(**SMALL, use_pqc=False)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    clean = [_sine_batch(rng) for _ in range(3)]
    noise = [0.3 * rng.standard_normal((2, 240, 1)).astype(np.float32)
             for _ in range(3)]
    reports = []
    state, history = train_denoise_course(
        config, gen, disc, (clean, noise), (clean[:1], noise[:1]),
        environment="LAPTOP", job_dir=str(tmp_path),
        report=lambda *a: reports.append(a), key=jax.random.PRNGKey(0),
    )
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_gen"])
    # epoch 1 enabled the discriminator
    assert history[1]["train_dis"] != 0.0
    assert any(r[0] == "Gradients" for r in reports)


def test_latest_checkpoint_and_profiling_utils(tmp_path):
    from dl_speech_enhancement_tpu.train.checkpoint import latest_checkpoint
    import os
    for steps in (100, 2000, 500):
        os.makedirs(tmp_path / f"checkpoint-{steps}steps")
    os.makedirs(tmp_path / "not-a-checkpoint")
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-2000steps")
    assert latest_checkpoint(str(tmp_path / "missing")) is None

    from dl_speech_enhancement_tpu.utils.profiling import StepTimer, measure_rtf
    timer = StepTimer()
    with timer.measure():
        pass
    assert timer.stats()["n"] == 1

    import jax.numpy as jnp
    fn = jax.jit(lambda x: x * 2.0)
    r = measure_rtf(fn, jnp.zeros((1, 4800, 1)), sample_rate=4800, n_iters=3,
                    warmup=1)
    assert r["x_realtime"] > 0 and r["audio_seconds"] == 1.0


def test_checkpoint_roundtrip(tmp_path, rng):
    gen = AudioDecGenerator(**SMALL, use_pqc=True)
    params, vqs = gen.init(jax.random.PRNGKey(0))
    opt = build_optimizer("Adam", {"lr": 1e-4})
    state = {"params_generator": params, "vq_state": vqs,
             "opt_generator": opt.init(params), "steps": 7}
    path = str(tmp_path / "checkpoint-7steps")
    save_checkpoint(path, state, config={"a": 1})
    restored = load_checkpoint(path, like=state)
    for x, y in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    import os
    assert os.path.exists(str(tmp_path / "config.yml"))


def test_grad_accum_step_matches_full_batch(rng):
    """grad_accum=K must reproduce the full-batch adversarial step for the
    batch-mean losses (mel/adv/feature-matching): averaged microbatch grads
    equal the full-batch grads up to float reassociation. The SNR gate is
    batch-global (covered separately) so it's disabled here."""
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    disc = HiFiGANDiscriminator(
        scales=2, periods=(2, 3),
        scale_discriminator_params=dict(channels=4,
                                        max_downsample_channels=8,
                                        max_groups=1,
                                        downsample_scales=(2, 2)),
        period_discriminator_params=dict(channels=4,
                                         max_downsample_channels=8,
                                         downsample_scales=(2, 2)),
    )
    base = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=0.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
    )
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4}, grad_norm=10.0)

    x = jnp.asarray(rng.standard_normal((4, 96, 1)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((4, 96, 1)).astype(np.float32) * 0.1)

    results = []
    for accum in (1, 2, 4):
        cfg = dict(base, grad_accum=accum)
        step = make_course_steps(gen, disc, cfg, opt_g, opt_d)["train_disc"]
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        state = {
            "params_generator": copy(params_g),
            "params_discriminator": copy(params_d),
            "opt_generator": opt_g.init(copy(params_g)),
            "opt_discriminator": opt_d.init(copy(params_d)),
        }
        new_state, g_loss, d_loss, frags, _ = step(state, x, t)
        results.append((new_state, float(g_loss), float(d_loss),
                        {k: float(v) for k, v in frags.items()}))

    (s0, g0, d0, f0) = results[0]
    for s1, g1, d1, f1 in results[1:]:
        np.testing.assert_allclose(g0, g1, rtol=1e-5)
        np.testing.assert_allclose(d0, d1, rtol=1e-5)
        for k in f0:
            np.testing.assert_allclose(f0[k], f1[k], rtol=1e-4, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(s0["params_generator"]),
                        jax.tree_util.tree_leaves(s1["params_generator"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0["params_discriminator"]),
                        jax.tree_util.tree_leaves(s1["params_discriminator"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_wave_l1_extension(rng):
    """lambda_wave_l1 > 0 adds exactly lambda * mean|y - t| to the
    generator objective (EXTENSION; default 0 = reference-faithful)."""
    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    base = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
    )
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4}, grad_norm=10.0)
    x = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)

    def one(lam):
        cfg = dict(base, lambda_wave_l1=lam)
        step = make_course_steps(gen, disc, cfg, opt_g, opt_d)["train"]
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        state = {
            "params_generator": copy(params_g),
            "params_discriminator": copy(params_d),
            "opt_generator": opt_g.init(copy(params_g)),
            "opt_discriminator": opt_d.init(copy(params_d)),
        }
        _, g_loss, _, frags, _ = step(state, x, t)
        return float(g_loss), {k: float(v) for k, v in frags.items()}

    g0, f0 = one(0.0)
    g1, f1 = one(3.0)
    assert "wave_l1_loss" not in f0
    assert f1["wave_l1_loss"] > 0
    # identical forward (same init/batch): the added term is exactly the
    # loss delta, and equals 3 * mean|y - t| within float tolerance
    np.testing.assert_allclose(g1 - g0, f1["wave_l1_loss"], rtol=1e-4)
    np.testing.assert_allclose(f1["mel_loss"], f0["mel_loss"], rtol=1e-5)


def test_grad_accum_snr_gate_is_per_microbatch(rng):
    """With the SNR gate enabled, grad_accum evaluates 1-sigmoid(SNR) per
    microbatch and averages (documented semantic: SNR is batch-global, so
    the full-batch value is not decomposable) — the result must stay within
    ~1e-3 relative of the full-batch step at these loss scales."""
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    base = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0,
    )
    params_g, _ = gen.init(jax.random.PRNGKey(0))
    opt_g = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    x = jnp.asarray(rng.standard_normal((4, 96, 1)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((4, 96, 1)).astype(np.float32) * 0.1)

    losses = {}
    for accum in (1, 4):
        cfg = dict(base, grad_accum=accum)
        step = make_course_steps(gen, None, cfg, opt_g, opt_g)["train"]
        state = {
            "params_generator": jax.tree_util.tree_map(jnp.copy, params_g),
            "opt_generator": opt_g.init(params_g),
        }
        _, g_loss, _, frags, _ = step(state, x, t)
        losses[accum] = (float(g_loss), float(frags["snr_loss"]))

    np.testing.assert_allclose(losses[1][0], losses[4][0], rtol=2e-3)
    np.testing.assert_allclose(losses[1][1], losses[4][1], rtol=0.2)


def test_grad_accum_rejects_indivisible_batch(rng):
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer
    import pytest

    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    cfg = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, grad_accum=2,
    )
    opt = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    params_g, _ = gen.init(jax.random.PRNGKey(0))
    state = {"params_generator": params_g, "opt_generator": opt.init(params_g)}
    step = make_course_steps(gen, None, cfg, opt, opt)["train"]
    x = jnp.zeros((3, 96, 1), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, x, x)


def test_discriminator_remat_step_matches_plain(rng):
    """discriminator_remat=True must be a pure memory/recompute trade: the
    adversarial course step produces identical losses and updated params."""
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import make_course_steps
    from dl_speech_enhancement_tpu.train.optim import build_optimizer

    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    disc = HiFiGANDiscriminator(
        scales=2, periods=(2, 3),
        scale_discriminator_params=dict(channels=4,
                                        max_downsample_channels=8,
                                        max_groups=1,
                                        downsample_scales=(2, 2)),
        period_discriminator_params=dict(channels=4,
                                         max_downsample_channels=8,
                                         downsample_scales=(2, 2)),
    )
    base = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
    )
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4}, grad_norm=10.0)

    x = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)

    results = []
    for flag in (False, True):
        cfg = dict(base, discriminator_remat=flag)
        step = make_course_steps(gen, disc, cfg, opt_g, opt_d)["train_disc"]
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        state = {
            "params_generator": copy(params_g),
            "params_discriminator": copy(params_d),
            "opt_generator": opt_g.init(copy(params_g)),
            "opt_discriminator": opt_d.init(copy(params_d)),
        }
        # the step donates its state; feed copies so both runs start equal
        new_state, g_loss, d_loss, frags, _ = step(state, x, t)
        results.append((new_state, float(g_loss), float(d_loss),
                        {k: float(v) for k, v in frags.items()}))

    (s0, g0, d0, f0), (s1, g1, d1, f1) = results
    np.testing.assert_allclose(g0, g1, rtol=1e-6)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], rtol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s0["params_generator"]),
                    jax.tree_util.tree_leaves(s1["params_generator"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s0["params_discriminator"]),
                    jax.tree_util.tree_leaves(s1["params_discriminator"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_adam_weight_decay_matches_torch_coupled_l2(rng):
    """Reference configs feed weight_decay to torch.optim.Adam, whose decay
    is COUPLED L2 (added to the grad before the moment update) — not
    adamw's decoupled form. Golden vs torch over 5 steps."""
    import torch
    import optax

    w0 = rng.standard_normal(16).astype(np.float32)
    opt = build_optimizer(
        "Adam", {"lr": 1e-2, "betas": [0.9, 0.999], "weight_decay": 0.1})
    p = jnp.asarray(w0)
    state = opt.init(p)
    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tp], lr=1e-2, betas=(0.9, 0.999),
                            weight_decay=0.1)
    for i in range(5):
        g = np.sin(np.arange(16, dtype=np.float32) + i)
        upd, state = opt.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, upd)
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(), atol=2e-6)


def test_discriminator_dtype_bf16_extension(rng):
    """`discriminator_dtype: bf16` (EXTENSION, opt-in) runs every
    discriminator pass in bfloat16. The adversarial step stays finite and
    close to the f32 step at bf16 tolerance; the default config is
    bit-identical to the pre-knob behavior (same jaxpr path)."""
    kw = dict(use_pqc=False, encode_channels=4, decode_channels=4,
              enc_ratios=(2, 4), enc_strides=(2, 2),
              dec_ratios=(4, 2), dec_strides=(2, 2), code_dim=8)
    gen = AudioDecGenerator(**kw)
    disc = HiFiGANDiscriminator(**TINY_DISC)
    base = dict(
        mel_loss_params=dict(fs=2400, fft_sizes=[64], hop_sizes=[16],
                             win_lengths=[None], num_mels=8, fmin=0,
                             fmax=1200, log_base=None),
        lambda_mel_loss=45.0, lambda_snr_loss=1.0, lambda_adv=1.0,
        lambda_feat_match=2.0,
    )
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    params_g, _ = gen.init(kg)
    params_d = disc.init(kd)
    opt_g = build_optimizer("Adam", {"lr": 1e-3}, grad_norm=10.0)
    opt_d = build_optimizer("Adam", {"lr": 2e-4}, grad_norm=10.0)
    x = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((2, 96, 1)).astype(np.float32) * 0.1)

    def one(dtype):
        cfg = dict(base) if dtype is None else dict(
            base, discriminator_dtype=dtype)
        step = make_course_steps(gen, disc, cfg, opt_g, opt_d)["train_disc"]
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        state = {
            "params_generator": copy(params_g),
            "params_discriminator": copy(params_d),
            "opt_generator": opt_g.init(copy(params_g)),
            "opt_discriminator": opt_d.init(copy(params_d)),
        }
        _, g_loss, d_loss, frags, _ = step(state, x, t)
        return (float(g_loss), float(d_loss),
                {k: float(v) for k, v in frags.items()})

    g32, d32, f32_ = one(None)
    g32b, d32b, _ = one("float32")   # explicit f32 == default
    g16, d16, f16 = one("bf16")
    np.testing.assert_allclose(g32, g32b, rtol=0)
    np.testing.assert_allclose(d32, d32b, rtol=0)
    assert np.isfinite(g16) and np.isfinite(d16)
    # bf16 has ~3 decimal digits; adversarial/FM fragments should agree
    # loosely and the metric fragments exactly (mel/snr are all-f32)
    np.testing.assert_allclose(f16["mel_loss"], f32_["mel_loss"], rtol=1e-5)
    np.testing.assert_allclose(g16, g32, rtol=0.1)
    np.testing.assert_allclose(d16, d32, rtol=0.15)
