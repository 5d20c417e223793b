"""Batch inference for scoring (testing_denoise.py equivalent).

Builds a model zoo — without-PQC denoiser checkpoints ("flagships",
testing_denoise.py:106-113) and optionally a composite AudioDec (PQC encoder
-> HiFiGAN vocoder, testing_denoise.py:72-103) — runs the seeded test split
with on-the-fly noise mixing, and writes per-model wavs to
``test_out/<model>/test-N.wav`` for DNSMOS scoring.

Usage:
    python -m dl_speech_enhancement_tpu.cli.testing_denoise \
        -e LAPTOP --clean-path ... --noise-path ... \
        --flagship name=job_out/<task>checkpoint-<steps> \
        [--vocoder exp/vocoder/<tag>/checkpoint-...:exp/autoencoder/...]
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def load_flagship(checkpoint: str, generator_params: dict):
    """Without-PQC generator restored from a course checkpoint
    (testing_denoise.py:106-113)."""
    import jax
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint

    gen = AudioDecGenerator(**generator_params, use_pqc=False)
    params_like, _ = gen.init(jax.random.PRNGKey(0))
    restored = load_checkpoint(checkpoint, like={"params_generator": params_like})
    params = restored["params_generator"]

    import jax.numpy as jnp

    @jax.jit
    def infer(x):
        y, *_ = gen(params, None, x, train=False)
        return y
    return infer, gen.hop


def define_AD_model(analyzer_ckpt: str, vocoder_ckpt: str):
    """Composite: PQC analyzer encode->quantize + HiFiGAN vocoder decode
    (testing_denoise.py:72-103)."""
    import jax
    from dl_speech_enhancement_tpu.utils.audiodec import (
        load_generator_from_checkpoint,
    )
    from dl_speech_enhancement_tpu.utils.config import load_config_beside
    from dl_speech_enhancement_tpu.utils.model_factory import build_generator
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint

    analyzer, a_params, vq_state, _ = load_generator_from_checkpoint(analyzer_ckpt)
    v_config = load_config_beside(vocoder_ckpt)
    voc = build_generator(v_config["model_type"], v_config["generator_params"])
    v_like = voc.init(jax.random.PRNGKey(0))
    v_params = load_checkpoint(
        vocoder_ckpt, like={"params_generator": v_like}
    )["params_generator"]

    @jax.jit
    def infer(x):
        e = analyzer.encoder(a_params["encoder"], x)
        z = analyzer.projector(a_params["projector"], e)
        zq, _ = analyzer.quantizer.inference(vq_state, z)
        return voc(v_params, zq)
    return infer, analyzer.hop


def infer_split(models: dict, clean_loader, noise_loader, out_dir: str,
                sample_rate: int, mix_rng, laptop: bool = False):
    """Run the test split through every model, dumping wavs
    (testing_denoise.py:171-209)."""
    import jax.numpy as jnp
    from dl_speech_enhancement_tpu.data import add_noise, write_wav

    counters = {name: 0 for name in models}
    for i_batch, (clean_batch, noise_batch) in enumerate(
        zip(clean_loader, noise_loader)
    ):
        if laptop and i_batch == 3:
            break
        mixed = add_noise(clean_batch, noise_batch, mix_rng.integers(10, 20))
        for name, (infer, hop) in models.items():
            t = (mixed.shape[1] // hop) * hop
            y = np.asarray(infer(jnp.asarray(mixed[:, :t])))
            for b in range(y.shape[0]):
                n = counters[name]
                write_wav(os.path.join(out_dir, name, f"test-{n}.wav"),
                          y[b, :, 0], sample_rate)
                counters[name] += 1
        # also dump the references once
        for b in range(mixed.shape[0]):
            n = i_batch * mixed.shape[0] + b
            write_wav(os.path.join(out_dir, "noisy", f"test-{n}.wav"),
                      mixed[b, :, 0], sample_rate)
            write_wav(os.path.join(out_dir, "clean", f"test-{n}.wav"),
                      clean_batch[b, :, 0], sample_rate)
    return counters


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("-e", "--environment", default="LAPTOP")
    parser.add_argument("-c", "--config", default="symAD_custom.yaml")
    parser.add_argument("--config-dir", default=os.path.join("configs", "denoise"))
    parser.add_argument("--clean-path", required=True)
    parser.add_argument("--noise-path", required=True)
    parser.add_argument("--flagship", action="append", default=[],
                        help="name=checkpoint_dir (repeatable)")
    parser.add_argument("--vocoder", default=None,
                        help="vocoder_ckpt:analyzer_ckpt composite model")
    parser.add_argument("--out-dir", default="test_out")
    args = parser.parse_args(argv)

    from dl_speech_enhancement_tpu.utils.config import load_config
    from dl_speech_enhancement_tpu.data import AudioDataset, get_dataloaders

    config = load_config(os.path.join(args.config_dir, args.config))
    sr = config["sample_rate"]
    seed = config["seed"]

    clean_root = os.path.basename(args.clean_path.rstrip("/"))
    noise_root = os.path.basename(args.noise_path.rstrip("/"))
    clean_ds = AudioDataset(args.clean_path, clean_root, sr)
    noise_ds = AudioDataset(args.noise_path, noise_root, sr)
    batch_size = 4 if args.environment == "LAPTOP" else int(config["batch_size"])
    # the seeded split keeps train/test disjoint across scripts
    _, _, test_clean = get_dataloaders(clean_ds, [0.7, 0.15, 0.15],
                                       batch_size, sr, seed)
    _, _, test_noise = get_dataloaders(noise_ds, [0.7, 0.15, 0.15],
                                       batch_size, sr, seed)

    models = {}
    for spec in args.flagship:
        name, ckpt = spec.split("=", 1)
        models[name] = load_flagship(ckpt, config["generator_params"])
    if args.vocoder:
        voc_ckpt, ana_ckpt = args.vocoder.split(":", 1)
        models["AD"] = define_AD_model(ana_ckpt, voc_ckpt)
    assert models, "no models given (--flagship / --vocoder)"

    mix_rng = np.random.default_rng(seed)
    counters = infer_split(models, test_clean, test_noise, args.out_dir, sr,
                           mix_rng, laptop=args.environment == "LAPTOP")
    logger.info("wrote: %s", counters)
    return counters


if __name__ == "__main__":
    main()
