"""CLI end-to-end tests on a tiny synthetic corpus (the LAPTOP smoke path)."""

import os

import numpy as np
import pytest
import yaml

from dl_speech_enhancement_tpu.data import write_wav

SR = 4800

TINY_GEN = dict(
    input_channels=1, output_channels=1, encode_channels=8, decode_channels=8,
    code_dim=16, codebook_num=2, codebook_size=32, bias=True,
    enc_ratios=[2, 4], dec_ratios=[4, 2], enc_strides=[3, 4],
    dec_strides=[4, 3], mode="causal", codec="audiodec",
    projector="conv1d", quantier="residual_vq",
)

TINY_DISC = dict(
    scales=2,
    scale_downsample_pooling="AvgPool1d",
    scale_downsample_pooling_params={"kernel_size": 4, "stride": 2, "padding": 2},
    scale_discriminator_params={
        "kernel_sizes": [15, 41, 5, 3], "channels": 8,
        "max_downsample_channels": 32, "max_groups": 4,
        "downsample_scales": [2, 2, 1],
    },
    follow_official_norm=True,
    periods=[2, 3],
    period_discriminator_params={
        "kernel_sizes": [5, 3], "channels": 4,
        "downsample_scales": [3, 3, 1], "max_downsample_channels": 16,
    },
)

MEL_TINY = dict(fs=SR, fft_sizes=[256], hop_sizes=[60], win_lengths=[None],
                window="hann_window", num_mels=20, fmin=0, fmax=SR // 2,
                log_base=None)


def _write_corpus(root, n=6, seconds=1.2):
    rng = np.random.default_rng(11)
    for sub in ("clean_train", "clean_valid", "noisy_train", "noisy_valid"):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            t = np.arange(int(SR * seconds)) / SR
            x = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)
            if sub.startswith("noisy"):
                x = x + 0.1 * rng.standard_normal(len(t))
            write_wav(os.path.join(d, f"utt{i}.wav"), x.astype(np.float32), SR)


def _base_config(tmp_path, train_mode):
    return {
        "sampling_rate": SR,
        "data": {
            "path": str(tmp_path / "corpus"),
            "subset": {
                "clean_train": "clean_train", "clean_valid": "clean_valid",
                "noisy_train": "noisy_train", "noisy_valid": "noisy_valid",
                "train": "clean_train", "valid": "clean_valid",
            },
        },
        "model_type": "symAudioDec",
        "train_mode": train_mode,
        "paradigm": "efficient",
        "generator_params": TINY_GEN,
        "discriminator_params": TINY_DISC,
        "use_mel_loss": True,
        "mel_loss_params": MEL_TINY,
        "use_stft_loss": False,
        "use_shape_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "use_feat_match_loss": True,
        "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_vq_loss": 1.0,
        "lambda_mel_loss": 45.0,
        "batch_size": 2,
        "batch_length": 2400,
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 1000, "gamma": 1.0},
        "generator_grad_norm": -1,
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"gamma": 0.5, "milestones": [1000]},
        "discriminator_grad_norm": -1,
        "start_steps": {"generator": 0, "discriminator": 4},
        "train_max_steps": 6,
        "save_interval_steps": 10 ** 9,
        "eval_interval_steps": 10 ** 9,
        "log_interval_steps": 3,
        "seed": 5,
    }


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_root")
    _write_corpus(os.path.join(root, "corpus"))
    return root


def test_cli_train_autoencoder_then_statistic_then_test(corpus, monkeypatch):
    from dl_speech_enhancement_tpu.cli import train as train_cli
    from dl_speech_enhancement_tpu.cli import statistic as stat_cli
    from dl_speech_enhancement_tpu.cli import test as test_cli

    monkeypatch.chdir(corpus)
    cfg = _base_config(corpus, "autoencoder")
    cfg_path = str(corpus / "ae.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    train_cli.main(["-c", cfg_path, "--tag", "tiny"])
    ckpt = str(corpus / "exp" / "autoencoder" / "tiny" / "checkpoint-6steps")
    assert os.path.isdir(ckpt)
    assert os.path.exists(str(corpus / "exp" / "autoencoder" / "tiny" / "config.yml"))

    # statistic workload over the analyzer
    stat_cfg = {
        "sampling_rate": SR,
        "data": cfg["data"],
        "analyzer": ckpt,
        "stats": str(corpus / "stats" / "tiny.npy"),
    }
    stat_path = str(corpus / "stat.yaml")
    with open(stat_path, "w") as f:
        yaml.safe_dump(stat_cfg, f)
    stat_cli.main(["-c", stat_path])
    stats = np.load(stat_cfg["stats"])
    assert stats.shape == (2, 16)

    # offline codec test: RTF + wav dump
    out_dir = str(corpus / "test_out")
    mean_rtf = test_cli.run_codec_test(ckpt, str(corpus / "corpus" / "clean_valid"),
                                       out_dir, subset_num=2)
    assert np.isfinite(mean_rtf)
    wavs = os.listdir(out_dir)
    assert len(wavs) == 2


def test_cli_train_vocoder(corpus, monkeypatch):
    """Vocoder workload via the CLI: frozen analyzer from the AE checkpoint,
    stats-normalized HiFiGAN generator (depends on the AE+statistic test)."""
    from dl_speech_enhancement_tpu.cli import train as train_cli

    monkeypatch.chdir(corpus)
    cfg = _base_config(corpus, "vocoder")
    cfg["model_type"] = "HiFiGAN"
    cfg["analyzer"] = str(corpus / "exp" / "autoencoder" / "tiny" / "checkpoint-6steps")
    cfg["generator_params"] = {
        "in_channels": 16, "out_channels": 1, "channels": 32,
        "kernel_size": 7, "upsample_scales": [4, 3],
        "upsample_kernel_sizes": [8, 6], "resblock_kernel_sizes": [3],
        "resblock_dilations": [[1, 3]], "groups": 1, "bias": True,
        "use_additional_convs": True, "use_weight_norm": True,
        "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
        "stats": str(corpus / "stats" / "tiny.npy"),
    }
    cfg["generator_train_start_steps"] = 0
    cfg["discriminator_train_start_steps"] = 1
    cfg["train_max_steps"] = 3
    cfg_path = str(corpus / "voc.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_cli.main(["-c", cfg_path, "--tag", "tiny_voc"])
    assert os.path.isdir(
        str(corpus / "exp" / "vocoder" / "tiny_voc" / "checkpoint-3steps")
    )


def test_cli_train_denoise_framework(corpus, monkeypatch):
    from dl_speech_enhancement_tpu.cli import train as train_cli

    monkeypatch.chdir(corpus)
    cfg = _base_config(corpus, "denoise")
    cfg["initial"] = str(corpus / "exp" / "autoencoder" / "tiny" / "checkpoint-6steps")
    cfg["train_max_steps"] = 3
    cfg_path = str(corpus / "dn.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_cli.main(["-c", cfg_path, "--tag", "tiny_dn"])
    assert os.path.isdir(str(corpus / "exp" / "denoise" / "tiny_dn" / "checkpoint-3steps"))


def test_cli_train_resume(corpus, monkeypatch):
    """--resume restores steps and continues to the (raised) max."""
    from dl_speech_enhancement_tpu.cli import train as train_cli

    monkeypatch.chdir(corpus)
    cfg = _base_config(corpus, "autoencoder")
    cfg["train_max_steps"] = 9
    cfg_path = str(corpus / "ae_resume.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    ckpt = str(corpus / "exp" / "autoencoder" / "tiny" / "checkpoint-6steps")
    train_cli.main(["-c", cfg_path, "--tag", "tiny_resumed",
                    "--resume", ckpt])
    assert os.path.isdir(
        str(corpus / "exp" / "autoencoder" / "tiny_resumed" / "checkpoint-9steps")
    )


def test_cli_train_adversarial_phase2(corpus, monkeypatch):
    """Phase-2 rebuilds the loader at adv_batch_length and trains to
    adv_train_max_steps (bin/train.py:106-118 contract)."""
    from dl_speech_enhancement_tpu.cli import train as train_cli

    monkeypatch.chdir(corpus)
    cfg = _base_config(corpus, "autoencoder")
    cfg["train_max_steps"] = 2
    cfg["adv_train_max_steps"] = 4
    cfg["adv_batch_length"] = 1200
    cfg["start_steps"] = {"generator": 0, "discriminator": 2}
    cfg_path = str(corpus / "ae_adv.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_cli.main(["-c", cfg_path, "--tag", "tiny_adv"])
    assert os.path.isdir(
        str(corpus / "exp" / "autoencoder" / "tiny_adv" / "checkpoint-4steps")
    )


def test_cli_analyze_eval_wavs(corpus, monkeypatch, tmp_path):
    """--eval-wavs mode: metric battery over saved wavs (the reference's
    mel_spectrogram.py workflow)."""
    import numpy as _np
    from dl_speech_enhancement_tpu.cli import analyze as analyze_cli
    from dl_speech_enhancement_tpu.data import write_wav as _ww

    rng = _np.random.default_rng(0)
    t = _np.arange(SR) / SR
    clean = (0.4 * _np.sin(2 * _np.pi * 220 * t)).astype(_np.float32)
    noisy = clean + 0.05 * rng.standard_normal(SR).astype(_np.float32)
    cp = str(tmp_path / "clean.wav")
    np_ = str(tmp_path / "noisy.wav")
    _ww(cp, clean, SR)
    _ww(np_, noisy, SR)
    results = analyze_cli.main(["--clean", cp, "--eval-wavs", np_])
    battery = results[np_]
    for key in ("STOI", "SI-SDR", "SDR", "SNR", "Mel-L1"):
        assert key in battery


def test_load_pair_vocoder_preset(corpus, monkeypatch, tmp_path):
    """load_pair builds analyzer-tx + vocoder-rx from preset-shaped paths
    (depends on the AE + vocoder CLI tests above)."""
    import shutil
    import jax.numpy as jnp
    import numpy as _np
    from dl_speech_enhancement_tpu.utils.audiodec import load_pair
    from dl_speech_enhancement_tpu.stream.runtime import VocoderReceiver

    exp = tmp_path / "exp"
    ae_src = corpus / "exp" / "autoencoder" / "tiny"
    voc_src = corpus / "exp" / "vocoder" / "tiny_voc"
    ae_dst = exp / "autoencoder" / "symAD_vctk_48000_hop300"
    voc_dst = exp / "vocoder" / "AudioDec_v1_symAD_vctk_48000_hop300_clean"
    shutil.copytree(ae_src / "checkpoint-6steps", ae_dst / "checkpoint-200000steps")
    shutil.copy(ae_src / "config.yml", ae_dst / "config.yml")
    shutil.copytree(voc_src / "checkpoint-3steps", voc_dst / "checkpoint-500000steps")
    shutil.copy(voc_src / "config.yml", voc_dst / "config.yml")

    tx, rx, sr = load_pair("vctk_v1", exp_root=str(exp))
    assert isinstance(rx, VocoderReceiver)
    assert sr == 48000
    chunk = jnp.asarray(
        _np.random.default_rng(0).standard_normal((1, tx.gen.hop * 2, 1))
        .astype(_np.float32))
    idx = tx.encode(chunk)
    y = rx.decode(idx)
    assert y.shape == (1, tx.gen.hop * 2, 1)

    # the same preset drives a mesh-sharded fleet: cli.serve --model pairs
    # the analyzer tx with the vocoder rx inside the one-dispatch step
    from dl_speech_enhancement_tpu.cli import serve as serve_cli

    wav = str(tmp_path / "in.wav")
    write_wav(wav, (0.3 * _np.random.default_rng(1)
                    .standard_normal(96)).astype(_np.float32), SR)
    out = str(tmp_path / "served.wav")
    stats = serve_cli.main([
        "--model", "vctk_v1", "--exp-root", str(exp), "--streams", "8",
        "-i", wav, "-o", out, "--frame-size", str(tx.gen.hop * 2),
        "--block-frames", "4", "--max-outputs", "1",
    ])
    assert stats["streams"] == 8 and stats["devices"] == 8
    assert os.path.exists(str(tmp_path / "served-0.wav"))


def test_cli_train_denoise_course_laptop(corpus, monkeypatch, tmp_path):
    from dl_speech_enhancement_tpu.cli import train_denoise as course_cli

    monkeypatch.chdir(corpus)
    cfg = {
        "sample_rate": SR, "initial_model": "", "step": 0,
        "experiment_name": "tiny-course", "epochs": 1,
        "epoch_to_enable_discriminator": 0,
        "noise_dropout_rate": 0.5, "noise_dropout_rate_decay": 0.1,
        "epoch_to_enable_noise_dropout_decay": 0, "seed": 9,
        "lambda_snr_loss": 1.0,
        "generator_params": TINY_GEN,
        "discriminator_params": TINY_DISC,
        "mel_loss_params": MEL_TINY,
        "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_mel_loss": 45.0,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "discriminator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "generator_grad_norm": -1, "discriminator_grad_norm": -1,
        "batch_size": 2,
    }
    cfg_dir = corpus / "configs" / "denoise"
    os.makedirs(cfg_dir, exist_ok=True)
    with open(cfg_dir / "tiny.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    state, history = course_cli.main([
        "-e", "LAPTOP", "-c", "tiny.yaml",
        "--config-dir", str(cfg_dir),
        "--clean-path", str(corpus / "corpus" / "clean_train"),
        "--noise-path", str(corpus / "corpus" / "noisy_train"),
        "--job-dir", str(corpus / "job_out"),
    ])
    assert len(history) == 1
    assert np.isfinite(history[0]["val_gen"])


def test_cli_train_denoise_course_wave_l1_preset(corpus, monkeypatch):
    """The shipped wave-L1 preset (configs/denoise/symAD_48MelWaveL1.yaml,
    VERDICT r4 #6) is a loadable course config whose lambda_wave_l1 key
    reaches the training objective: a LAPTOP run with the preset's lambda
    (tiny models, same schema) reports the wave_l1_loss fragment."""
    import dl_speech_enhancement_tpu  # repo root anchor

    from dl_speech_enhancement_tpu.cli import train_denoise as course_cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(
        dl_speech_enhancement_tpu.__file__)))
    with open(os.path.join(repo, "configs", "denoise",
                           "symAD_48MelWaveL1.yaml")) as f:
        preset = yaml.safe_load(f)
    assert preset["lambda_wave_l1"] == 100.0
    assert preset["sample_rate"] == 48000
    # the preset keeps the reference schema: same generator/discriminator
    # key surface as symAD_custom.yaml
    assert set(TINY_GEN) <= set(preset["generator_params"])

    monkeypatch.chdir(corpus)
    cfg = {
        "sample_rate": SR, "initial_model": "", "step": 0,
        "experiment_name": "tiny-wl1", "epochs": 1,
        "epoch_to_enable_discriminator": 100,
        "noise_dropout_rate": 0.5, "noise_dropout_rate_decay": 0.1,
        "epoch_to_enable_noise_dropout_decay": 0, "seed": 9,
        "lambda_snr_loss": 1.0,
        "lambda_wave_l1": preset["lambda_wave_l1"],
        "generator_params": TINY_GEN,
        "discriminator_params": TINY_DISC,
        "mel_loss_params": MEL_TINY,
        "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_mel_loss": 45.0,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "discriminator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
        "generator_grad_norm": -1, "discriminator_grad_norm": -1,
        "batch_size": 2,
    }
    cfg_dir = corpus / "configs" / "denoise"
    os.makedirs(cfg_dir, exist_ok=True)
    with open(cfg_dir / "tiny_wl1.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    state, history = course_cli.main([
        "-e", "LAPTOP", "-c", "tiny_wl1.yaml",
        "--config-dir", str(cfg_dir),
        "--clean-path", str(corpus / "corpus" / "clean_train"),
        "--noise-path", str(corpus / "corpus" / "noisy_train"),
        "--job-dir", str(corpus / "job_out"),
    ])
    assert len(history) == 1
    assert np.isfinite(history[0]["val_gen"])
    assert history[0]["frags"].get("wave_l1_loss", 0.0) > 0.0
