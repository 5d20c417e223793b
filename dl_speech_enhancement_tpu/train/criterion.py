"""Criterion container built from reference-schema config keys.

Mirrors the loss wiring of the reference drivers (trainer/trainerGAN.py:
214-268 consumes ``criterion['mel'|'stft'|'shape'|'gen_adv'|'dis_adv'|
'feat_match']`` gated by ``use_*_loss`` config flags)."""

from __future__ import annotations

from dl_speech_enhancement_tpu.losses import (
    MultiMelSpectrogramLoss,
    MultiResolutionSTFTLoss,
    MultiWindowShapeLoss,
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
)


def build_criterion(config: dict) -> dict:
    crit = {}
    if config.get("use_mel_loss", False):
        crit["mel"] = MultiMelSpectrogramLoss(**config.get("mel_loss_params", {}))
    if config.get("use_stft_loss", False):
        crit["stft"] = MultiResolutionSTFTLoss(**config.get("stft_loss_params", {}))
    if config.get("use_shape_loss", False):
        crit["shape"] = MultiWindowShapeLoss(**config.get("shape_loss_params", {}))
    crit["gen_adv"] = GeneratorAdversarialLoss(
        **config.get("generator_adv_loss_params", {})
    )
    crit["dis_adv"] = DiscriminatorAdversarialLoss(
        **config.get("discriminator_adv_loss_params", {})
    )
    crit["feat_match"] = FeatureMatchLoss(**config.get("feat_match_loss_params", {}))
    return crit


def metric_loss(crit: dict, config: dict, predict_y, natural_y):
    """Weighted mel/stft/shape losses (trainerGAN.py:214-241).

    Returns (total, fragments dict)."""
    total = 0.0
    frags = {}
    if "mel" in crit:
        mel = crit["mel"](predict_y, natural_y) * config["lambda_mel_loss"]
        frags["mel_loss"] = mel
        total = total + mel
    if "stft" in crit:
        sc, mag = crit["stft"](predict_y, natural_y)
        sc = sc * config["lambda_stft_loss"]
        mag = mag * config["lambda_stft_loss"]
        frags["spectral_convergence_loss"] = sc
        frags["log_stft_magnitude_loss"] = mag
        total = total + sc + mag
    if "shape" in crit:
        shape = crit["shape"](predict_y, natural_y) * config["lambda_shape_loss"]
        frags["shape_loss"] = shape
        total = total + shape
    return total, frags


def adv_loss(crit: dict, config: dict, predict_p, natural_p=None):
    """Generator adversarial (+ feature matching) loss (trainerGAN.py:244-257)."""
    loss = crit["gen_adv"](predict_p)
    frags = {}
    if natural_p is not None:
        fm = crit["feat_match"](predict_p, natural_p)
        frags["feature_matching_loss"] = fm
        loss = loss + config["lambda_feat_match"] * fm
    loss = loss * config["lambda_adv"]
    frags["adversarial_loss"] = loss
    return loss, frags


def dis_loss(crit: dict, config: dict, predict_p, natural_p):
    """Discriminator loss (trainerGAN.py:260-268)."""
    real, fake = crit["dis_adv"](predict_p, natural_p)
    return real + fake, {"real_loss": real, "fake_loss": fake}
