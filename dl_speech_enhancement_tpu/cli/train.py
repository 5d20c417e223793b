"""AudioDec-framework training driver (codecTrain equivalent).

The reference's upstream driver ``codecTrain.py`` is gitignored; this module
provides the stage-template flow it implemented on top of bin/train.py:26-124:
seeding, config+argparse merge persisted to the expdir, workload dispatch by
``train_mode`` (autoencoder / vocoder / denoise), resume from checkpoint, and
the two-phase schedule (metric phase to ``train_max_steps``, then adversarial
phase with a re-built dataloader at ``adv_batch_length`` to
``adv_train_max_steps``, bin/train.py:106-123).

Usage:
    python -m dl_speech_enhancement_tpu.cli.train -c configs/autoencoder/
        symAD_vctk_48000_hop300.yaml --tag symAD_vctk_48000_hop300
"""

from __future__ import annotations

import logging
import os
import random
from argparse import ArgumentParser

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def build_data_loaders(config: dict, mode: str, batch_length: int):
    """Dataset selection per workload (clean for autoencoder/vocoder,
    noisy+clean pairs for denoise)."""
    from dl_speech_enhancement_tpu.data import (
        SingleDataset, MultiDataset, DataLoader, CollaterAudio,
        CollaterAudioPair,
    )

    sr = config["sampling_rate"]
    path = config["data"]["path"]
    subset = config["data"]["subset"]
    seed = config.get("seed", 1337)

    def single(sub):
        return SingleDataset(os.path.join(path, sub), sample_rate=sr)

    def pair(noisy_sub, clean_sub):
        return MultiDataset(
            [os.path.join(path, noisy_sub), os.path.join(path, clean_sub)],
            sample_rate=sr,
        )

    if mode in ("autoencoder", "vocoder"):
        train_key = "clean_train" if "clean_train" in subset else "train"
        valid_key = "clean_valid" if "clean_valid" in subset else "valid"
        train = single(subset[train_key])
        valid = single(subset[valid_key])
        coll = CollaterAudio(batch_length, rng=np.random.default_rng(seed))
    elif mode == "denoise":
        train = pair(subset["noisy_train"], subset["clean_train"])
        valid = pair(subset["noisy_valid"], subset["clean_valid"])
        pair_coll = CollaterAudioPair(batch_length, rng=np.random.default_rng(seed))

        def coll(items):
            return pair_coll([tuple(i) for i in items])
    else:
        raise NotImplementedError(f"train_mode: {mode}")

    bs = config["batch_size"]
    return {
        "train": DataLoader(train, bs, coll, seed=seed),
        "dev": DataLoader(valid, bs, coll, seed=seed + 1),
    }


def build_trainer(config: dict, data_loader):
    import jax
    from dl_speech_enhancement_tpu.utils.model_factory import (
        build_generator, build_discriminator,
    )

    mode = config["train_mode"]
    model_type = config["model_type"]
    key = jax.random.PRNGKey(config.get("seed", 1337))

    if mode == "autoencoder":
        from dl_speech_enhancement_tpu.train.workloads.autoencoder import Trainer
        gen = build_generator(model_type, config["generator_params"])
        disc = build_discriminator(model_type, config["discriminator_params"])
        return Trainer(0, 0, data_loader, gen, disc, config, key=key)

    if mode == "vocoder":
        from dl_speech_enhancement_tpu.train.workloads.vocoder import Trainer
        from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
        from dl_speech_enhancement_tpu.utils.config import load_config_beside
        from dl_speech_enhancement_tpu.models import AudioDecGenerator

        analyzer_ckpt = config["analyzer"]
        a_config = load_config_beside(analyzer_ckpt)
        analyzer = AudioDecGenerator(**a_config["generator_params"], use_pqc=True)
        params_like, vq_like = analyzer.init(jax.random.PRNGKey(0))
        restored = load_checkpoint(
            analyzer_ckpt,
            like={"params_generator": params_like, "vq_state": vq_like},
        )
        gen = build_generator(model_type, config["generator_params"])
        disc = build_discriminator(model_type, config["discriminator_params"])
        return Trainer(0, 0, data_loader, analyzer,
                       restored["params_generator"], restored["vq_state"],
                       gen, disc, config, key=key)

    if mode == "denoise":
        from dl_speech_enhancement_tpu.train.workloads.denoise import Trainer
        from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
        gen = build_generator(model_type, config["generator_params"])
        initial_state = None
        if config.get("initial"):
            params_like, vq_like = gen.init(jax.random.PRNGKey(0))
            restored = load_checkpoint(
                config["initial"],
                like={"params_generator": params_like, "vq_state": vq_like},
            )
            initial_state = (restored["params_generator"], restored["vq_state"])
            logger.info("initialized from %s", config["initial"])
        return Trainer(0, 0, data_loader, gen, config, key=key,
                       initial_state=initial_state)

    raise NotImplementedError(f"train_mode: {mode}")


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--tag", default=None)
    parser.add_argument("--exp-root", default="exp")
    parser.add_argument("--resume", default="", nargs="?", const="auto",
                        help="checkpoint to resume from; bare --resume "
                        "resumes from the newest checkpoint in the expdir")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--dp", type=int, default=None, metavar="N",
                        help="data-parallel devices (-1 = all visible); "
                        "overrides config key parallel.data_devices")
    args = parser.parse_args(argv)

    from dl_speech_enhancement_tpu.utils.config import load_config, save_config

    config = load_config(args.config)
    if args.dp is not None:
        # a bare `parallel:` YAML section loads as None — don't setdefault
        config["parallel"] = dict(config.get("parallel") or {},
                                  data_devices=args.dp)
    if args.seed is not None:
        config["seed"] = args.seed
    seed = config.get("seed", 1337)
    random.seed(seed)
    np.random.seed(seed)

    mode = config["train_mode"]
    tag = args.tag or os.path.splitext(os.path.basename(args.config))[0]
    outdir = os.path.join(args.exp_root, mode, tag)
    config["outdir"] = outdir
    os.makedirs(outdir, exist_ok=True)
    save_config(os.path.join(outdir, "config.yml"), config)
    logger.info("expdir: %s", outdir)

    data_loader = build_data_loaders(config, mode, config["batch_length"])
    trainer = build_trainer(config, data_loader)

    resume = args.resume
    if resume == "auto":
        # bare --resume: resolve the newest checkpoint in the expdir (a
        # silent fresh start here would overwrite the previous run)
        from dl_speech_enhancement_tpu.train.checkpoint import (
            latest_checkpoint,
        )

        resume = latest_checkpoint(outdir)
        if resume is None:
            raise SystemExit(
                f"--resume given but no checkpoint found under {outdir}")
    if resume:
        trainer.load_checkpoint(resume)
        logger.info("resumed from %s (steps=%d)", resume, trainer.steps)

    try:
        trainer.run()
        # adversarial phase 2 (bin/train.py:106-118)
        adv_max = config.get("adv_train_max_steps", 0)
        if adv_max and trainer.steps < adv_max and "adv_batch_length" in config:
            logger.info("entering adversarial phase 2 (batch_length=%d)",
                        config["adv_batch_length"])
            trainer.data_loader = build_data_loaders(
                config, mode, config["adv_batch_length"]
            )
            trainer.train_max_steps = adv_max
            trainer.run()
    finally:
        trainer.save_checkpoint(
            os.path.join(outdir, f"checkpoint-{trainer.steps}steps")
        )
        logger.info("Successfully saved checkpoint @ %d steps.", trainer.steps)


if __name__ == "__main__":
    main()
