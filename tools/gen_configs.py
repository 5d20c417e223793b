#!/usr/bin/env python3
"""Generate the experiment config suite (same YAML schema as the reference).

Run: python tools/gen_configs.py — writes configs/{autoencoder,vocoder,
denoise,statistic}/*.yaml. Authored programmatically so shared blocks stay
consistent; values follow the published experiment spec (SURVEY.md §5.6).
"""

import copy
import os

import yaml

OUT = os.path.join(os.path.dirname(__file__), "..", "configs")


def generator_params(sr48=True):
    return {
        "input_channels": 1,
        "output_channels": 1,
        "encode_channels": 32,
        "decode_channels": 32,
        "code_dim": 64,
        "codebook_num": 8,
        "codebook_size": 1024,
        "bias": True,
        "enc_ratios": [2, 4, 8, 16],
        "dec_ratios": [16, 8, 4, 2],
        "enc_strides": [3, 4, 5, 5],
        "dec_strides": [5, 5, 4, 3],
        "mode": "causal",
        "codec": "audiodec",
        "projector": "conv1d",
        "quantier": "residual_vq",
    }


def hifigan_discriminator_params(scale_downsamples):
    return {
        "scales": 3,
        "scale_downsample_pooling": "AvgPool1d",
        "scale_downsample_pooling_params": {"kernel_size": 4, "stride": 2, "padding": 2},
        "scale_discriminator_params": {
            "in_channels": 1,
            "out_channels": 1,
            "kernel_sizes": [15, 41, 5, 3],
            "channels": 128,
            "max_downsample_channels": 1024,
            "max_groups": 16,
            "bias": True,
            "downsample_scales": scale_downsamples,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
        },
        "follow_official_norm": True,
        "periods": [2, 3, 5, 7, 11],
        "period_discriminator_params": {
            "in_channels": 1,
            "out_channels": 1,
            "kernel_sizes": [5, 3],
            "channels": 32,
            "downsample_scales": [3, 3, 3, 3, 1],
            "max_downsample_channels": 1024,
            "bias": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True,
            "use_spectral_norm": False,
        },
    }


def univnet_discriminator_params():
    return {
        "fft_sizes": [1024, 2048, 512],
        "hop_sizes": [120, 240, 50],
        "win_lengths": [600, 1200, 240],
        "window": "hann_window",
        "spectral_discriminator_params": {
            "channels": 32,
            "kernel_sizes": [[3, 9], [3, 9], [3, 9], [3, 9], [3, 3], [3, 3]],
            "strides": [[1, 1], [1, 2], [1, 2], [1, 2], [1, 1], [1, 1]],
            "bias": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
        },
        "periods": [2, 3, 5, 7, 11],
        "period_discriminator_params": {
            "in_channels": 1,
            "out_channels": 1,
            "kernel_sizes": [5, 3],
            "channels": 32,
            "downsample_scales": [3, 3, 3, 3, 1],
            "max_downsample_channels": 1024,
            "bias": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True,
            "use_spectral_norm": False,
        },
    }


def metric_losses(sr, mel_only=False, stft=True):
    cfg = {
        "use_mel_loss": True,
        "mel_loss_params": {
            "fs": sr,
            "fft_sizes": [2048],
            "hop_sizes": [300],
            "win_lengths": [None],
            "window": "hann_window",
            "num_mels": 80,
            "fmin": 0,
            "fmax": sr // 2,
            "log_base": None,
        },
        "use_stft_loss": False,
        "stft_loss_params": {
            "fft_sizes": [1024, 2048, 512],
            "hop_sizes": [120, 240, 50],
            "win_lengths": [600, 1200, 240],
            "window": "hann_window",
        },
        "use_shape_loss": False,
        "shape_loss_params": {"winlen": [300]},
    }
    return cfg


def adv_losses():
    return {
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "use_feat_match_loss": True,
        "feat_match_loss_params": {
            "average_by_discriminators": False,
            "average_by_layers": False,
            "include_final_outputs": False,
        },
    }


def lambdas(feat_match=2.0):
    return {
        "lambda_adv": 1.0,
        "lambda_feat_match": feat_match,
        "lambda_vq_loss": 1.0,
        "lambda_mel_loss": 45.0,
        "lambda_stft_loss": 45.0,
        "lambda_shape_loss": 45.0,
    }


def optimizers(gen_lr=1e-4, dis_lr=2e-4, milestones=(200000, 400000, 600000, 800000)):
    return {
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": gen_lr, "betas": [0.5, 0.9], "weight_decay": 0.0},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 200000, "gamma": 1.0},
        "generator_grad_norm": -1,
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": dis_lr, "betas": [0.5, 0.9], "weight_decay": 0.0},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"gamma": 0.5, "milestones": list(milestones)},
        "discriminator_grad_norm": -1,
    }


def data_block(sr, subsets):
    return {"path": f"corpus/{sr}", "subset": subsets}


def autoencoder_config(name, sr):
    cfg = {
        "sampling_rate": sr,
        "data": data_block(sr, {
            "clean_train": "clean_trainset_84spk_wav",
            "clean_valid": "clean_validset_84spk_wav",
            "clean_test": "clean_testset_wav",
            "noisy_train": "noisy_trainset_84spk_wav",
            "noisy_valid": "noisy_validset_84spk_wav",
            "noisy_test": "noisy_testset_wav",
        }),
        "model_type": "symAudioDec",
        "train_mode": "autoencoder",
        "paradigm": "efficient",
        "generator_params": generator_params(),
        "discriminator_params": hifigan_discriminator_params([4, 4, 4, 4, 1]),
    }
    cfg.update(metric_losses(sr))
    cfg.update(adv_losses())
    cfg.update(lambdas())
    cfg.update({
        "batch_size": 16 if sr == 48000 else 64,
        "batch_length": 96000 if sr == 48000 else 9600,
        "adv_batch_length": 9600,
        "pin_memory": True,
        "num_workers": 2,
    })
    cfg.update(optimizers())
    cfg.update({
        "start_steps": {"generator": 0, "discriminator": 200000},
        "train_max_steps": 200000,
        "adv_train_max_steps": 500000,
        "save_interval_steps": 100000,
        "eval_interval_steps": 1000,
        "log_interval_steps": 100,
    })
    return cfg


def vocoder_config(name, sr, version):
    cfg = {
        "sampling_rate": sr,
        "data": data_block(sr, {
            "train": "clean_trainset_84spk_wav",
            "valid": "clean_validset_84spk_wav",
            "test": "clean_testset_wav",
        }),
        "model_type": "HiFiGAN" if "univ" not in version else "UnivNet",
        "train_mode": "vocoder",
        "analyzer": "exp/autoencoder/symAD_vctk_48000_hop300/checkpoint-200000steps",
        "generator_params": {
            "in_channels": 64,
            "out_channels": 1,
            "channels": 512,
            "kernel_size": 7,
            "upsample_scales": [5, 5, 4, 3],
            "upsample_kernel_sizes": [10, 10, 8, 6],
            # v1 = grouped-conv fast decoder; v0 = full MRF
            "resblock_kernel_sizes": [11] if version == "v1" else [3, 7, 11],
            "resblock_dilations": ([[1, 3, 5]] if version == "v1"
                                    else [[1, 3, 5], [1, 3, 5], [1, 3, 5]]),
            "groups": 3 if version == "v1" else 1,
            "bias": True,
            "use_additional_convs": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True,
            "stats": "stats/symAD_vctk_48000_hop300_clean.npy",
        },
        "discriminator_params": (
            univnet_discriminator_params() if "univ" in version
            else hifigan_discriminator_params([2, 2, 4, 4, 1])
        ),
    }
    cfg.update(metric_losses(sr))
    cfg["use_stft_loss"] = True
    cfg.update(adv_losses())
    cfg.update(lambdas())
    cfg.update({
        "batch_size": 16,
        "batch_length": 9600,
        "pin_memory": True,
        "num_workers": 2,
    })
    cfg.update(optimizers(milestones=(200000, 400000, 600000, 800000)))
    cfg.update({
        "generator_train_start_steps": 1,
        "discriminator_train_start_steps": 0,
        "train_max_steps": 500000,
        "save_interval_steps": 100000,
        "eval_interval_steps": 1000,
        "log_interval_steps": 100,
    })
    return cfg


def denoise_framework_config(sr):
    cfg = autoencoder_config("denoise", sr)
    cfg["train_mode"] = "denoise"
    cfg["initial"] = "exp/autoencoder/symAD_vctk_48000_hop300/checkpoint-200000steps"
    return cfg


def course_config(name, sr, *, epochs=500, disc_epoch=100, ndo=0.8,
                  ndo_decay=0.1, snr_lambda=0.0, feat_match=1000.0,
                  initial_model="", step=0, seed=93):
    cfg = {
        "sample_rate": sr,
        "initial_model": initial_model,
        "step": step,
        "experiment_name": name,
        "epochs": epochs,
        "epoch_to_enable_discriminator": disc_epoch,
        "noise_dropout_rate": ndo,
        "noise_dropout_rate_decay": ndo_decay,
        "epoch_to_enable_noise_dropout_decay": 1,
        "seed": seed,
        "lambda_snr_loss": snr_lambda,
        "generator_params": generator_params(),
        "discriminator_params": hifigan_discriminator_params([4, 4, 4, 4, 1]),
    }
    cfg.update(metric_losses(sr))
    cfg.update(adv_losses())
    cfg.update(lambdas(feat_match=feat_match))
    cfg.update({
        "batch_size": 16 if sr == 48000 else 8,
        "batch_length": sr,  # 1 second crops (train_denoise.py:174)
        "pin_memory": True,
        "num_workers": 2,
    })
    cfg.update(optimizers(gen_lr=1e-4, dis_lr=2e-4))
    return cfg


def statistic_config(sr):
    return {
        "sampling_rate": sr,
        "data": data_block(sr, {
            "train": "clean_trainset_84spk_wav",
            "valid": "clean_validset_84spk_wav",
            "test": "clean_testset_wav",
        }),
        "analyzer": "exp/autoencoder/symAD_vctk_48000_hop300/checkpoint-200000steps",
        "stats": "stats/symAD_vctk_48000_hop300_clean.npy",
    }


def dump(rel, cfg):
    path = os.path.join(OUT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote", rel)


def main():
    dump("autoencoder/symAD_vctk_48000_hop300.yaml", autoencoder_config("symAD", 48000))
    dump("autoencoder/symAD_libritts_24000_hop300.yaml", autoencoder_config("symAD", 24000))
    univ = autoencoder_config("symADuniv", 48000)
    univ["model_type"] = "symAudioDecUniv"
    univ["discriminator_params"] = univnet_discriminator_params()
    dump("autoencoder/symADuniv_vctk_48000_hop300.yaml", univ)

    dump("vocoder/AudioDec_v0_symAD_vctk_48000_hop300_clean.yaml",
         vocoder_config("v0", 48000, "v0"))
    dump("vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml",
         vocoder_config("v1", 48000, "v1"))
    v2 = vocoder_config("v2", 48000, "v1")
    v2["generator_params"]["channels"] = 256
    dump("vocoder/AudioDec_v2_symAD_vctk_48000_hop300_clean.yaml", v2)
    v1_24 = vocoder_config("v1", 24000, "v1")
    dump("vocoder/AudioDec_v1_symAD_libritts_24000_hop300_clean.yaml", v1_24)
    dump("vocoder/AudioDec_v3_symADuniv_vctk_48000_hop300_clean.yaml",
         vocoder_config("v3", 48000, "univ"))

    dump("denoise/symAD_vctk_48000_hop300.yaml", denoise_framework_config(48000))
    dump("denoise/symAD_custom.yaml",
         course_config("48k-custom", 48000, feat_match=1000.0))
    dump("denoise/symAD_24Mel.yaml",
         course_config("24Mel", 24000, ndo=0.0, ndo_decay=0.0, feat_match=2.0))
    dump("denoise/symAD_24MelNDO.yaml",
         course_config("24Mel-NDO", 24000, feat_match=2.0))
    dump("denoise/symAD_24MelNDOSNR.yaml",
         course_config("24Mel-NDO-SNR", 24000, snr_lambda=1.0, feat_match=2.0))

    dump("statistic/symAD_vctk_48000_hop300_clean.yaml", statistic_config(48000))
    stat24 = statistic_config(24000)
    stat24["analyzer"] = "exp/autoencoder/symAD_libritts_24000_hop300/checkpoint-200000steps"
    stat24["stats"] = "stats/symAD_libritts_24000_hop300_clean.npy"
    dump("statistic/symAD_libritts_24000_hop300_clean.yaml", stat24)
    univ_stat = statistic_config(48000)
    univ_stat["analyzer"] = "exp/autoencoder/symADuniv_vctk_48000_hop300/checkpoint-200000steps"
    univ_stat["stats"] = "stats/symADuniv_vctk_48000_hop300_clean.npy"
    dump("statistic/symADuniv_vctk_48000_hop300_clean.yaml", univ_stat)


if __name__ == "__main__":
    main()
