"""Model construction by config ``model_type`` (the reference's dispatch).

The reference instantiates models by name in its (gitignored) drivers and in
utils/audiodec.py:32-57. Supported types mirror the config suite:
symAudioDec / symAudioDecUniv (codec), HiFiGAN / UnivNet (vocoder).
"""

from __future__ import annotations

import numpy as np

from dl_speech_enhancement_tpu.models import (
    AudioDecGenerator,
    HiFiGANGenerator,
    HiFiGANDiscriminator,
    UnivNetDiscriminator,
)


def _gen_stats(params: dict):
    p = dict(params)
    stats_path = p.pop("stats", None)
    if stats_path is not None:
        p["stats"] = np.load(stats_path)
    return p


def _hifigan_gen_params(params: dict) -> dict:
    p = _gen_stats(params)
    nl = p.pop("nonlinear_activation", "LeakyReLU")
    nlp = p.pop("nonlinear_activation_params", {"negative_slope": 0.1})
    assert nl == "LeakyReLU"
    p["negative_slope"] = nlp.get("negative_slope", 0.1)
    p.pop("use_weight_norm", None)  # always on in our parametrization
    return p


def build_generator(model_type: str, params: dict, use_pqc: bool = True):
    if model_type in ("symAudioDec", "symAudioDecUniv"):
        return AudioDecGenerator(**params, use_pqc=use_pqc)
    if model_type in ("HiFiGAN", "UnivNet"):
        return HiFiGANGenerator(**_hifigan_gen_params(params))
    raise NotImplementedError(f"Model type: {model_type} is not supported!")


def build_discriminator(model_type: str, params: dict):
    if model_type in ("symAudioDec", "HiFiGAN"):
        return HiFiGANDiscriminator(**params)
    if model_type in ("symAudioDecUniv", "UnivNet"):
        return UnivNetDiscriminator(**params)
    raise NotImplementedError(f"Model type: {model_type} is not supported!")
