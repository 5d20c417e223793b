"""Course denoise training CLI (drop-in for the reference train_denoise.py).

Usage:
    python -m dl_speech_enhancement_tpu.cli.train_denoise -e {LAPTOP,HPC} \
        -c symAD_custom.yaml [--clean-path DIR --noise-path DIR]

Same CLI/config contract as the reference (train_denoise.py:39-45): ``-c``
names a file under ``configs/denoise``. LAPTOP mode truncates every epoch to
3 batches as a smoke mode (train_denoise.py:308-310). Scalars go to
tensorboardX + console (the reference used ClearML, unavailable here).
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("-e", "--environment", default="LAPTOP")
    parser.add_argument("-c", "--config", default="symAD_custom.yaml")
    parser.add_argument("--config-dir", default=os.path.join("configs", "denoise"))
    parser.add_argument("--clean-path", default=None)
    parser.add_argument("--noise-path", default=None)
    parser.add_argument("--job-dir", default="job_out")
    parser.add_argument("--dp", type=int, default=None, metavar="N",
                        help="data-parallel devices (-1 = all visible); "
                        "overrides config key parallel.data_devices")
    args = parser.parse_args(argv)

    from dl_speech_enhancement_tpu.utils.config import load_config
    config = load_config(os.path.join(args.config_dir, args.config))
    if args.dp is not None:
        # a bare `parallel:` YAML section loads as None — don't setdefault
        config["parallel"] = dict(config.get("parallel") or {},
                                  data_devices=args.dp)

    env = args.environment
    if env == "LAPTOP":
        clean_path = args.clean_path or "corpus/train/clean"
        clean_root = "clean"
        noise_path = args.noise_path or "corpus/train/noise"
        noise_root = "noise"
        task_name = "Laptop-TEST-dropout"
    elif env == "HPC":
        clean_path = args.clean_path or os.environ.get(
            "DLSE_CLEAN_PATH", "corpus/train/clean")
        clean_root = os.path.basename(clean_path.rstrip("/"))
        noise_path = args.noise_path or os.environ.get(
            "DLSE_NOISE_PATH", "corpus/train/noise")
        noise_root = os.path.basename(noise_path.rstrip("/"))
        task_name = config["experiment_name"]
    else:
        raise Exception("Illegal argument: " + env)

    import jax
    from dl_speech_enhancement_tpu.data import AudioDataset, get_dataloaders
    from dl_speech_enhancement_tpu.models import (
        AudioDecGenerator, HiFiGANDiscriminator,
    )
    from dl_speech_enhancement_tpu.train.denoise_course import train_denoise_course
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint

    sample_rate = config["sample_rate"]
    seed = config["seed"]

    gen_params = dict(config["generator_params"])
    gen = AudioDecGenerator(**gen_params, use_pqc=False)
    disc = HiFiGANDiscriminator(**_clean_disc_params(config["discriminator_params"]))

    clean_dataset = AudioDataset(clean_path, clean_root, sample_rate)
    noise_dataset = AudioDataset(noise_path, noise_root, sample_rate)
    logger.info("clean files: %d, noise files: %d",
                len(clean_dataset), len(noise_dataset))

    batch_length = 1 * sample_rate
    batch_size = 4 if env == "LAPTOP" else int(config["batch_size"])
    split = [0.7, 0.15, 0.15]
    train_c, val_c, _ = get_dataloaders(clean_dataset, split, batch_size,
                                        batch_length, seed)
    train_n, val_n, _ = get_dataloaders(noise_dataset, split, batch_size,
                                        batch_length, seed)

    initial_params = None
    if config.get("initial_model"):
        ckpt = os.path.join(args.job_dir, config["initial_model"])
        try:
            params_like, _ = gen.init(jax.random.PRNGKey(0))
            initial_params = load_checkpoint(
                ckpt, like={"params_generator": params_like}
            )["params_generator"]
            logger.info("warm-started from %s", ckpt)
        except Exception as e:
            # keep the reference's message (train_denoise.py:116, typo and
            # all) but never hide WHY a named warm-start failed — a silent
            # random-init on a long run is the worst failure mode here
            logger.warning("warm-start from %s failed: %r", ckpt, e)
            print("No inital model")

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(os.path.join(args.job_dir, task_name))

        def report(category, series, value, iteration):
            writer.add_scalar(f"{category}/{series}", value, iteration)
    except ImportError:  # pragma: no cover
        report = None

    print("Start training")
    state, history = train_denoise_course(
        config, gen, disc, (train_c, train_n), (val_c, val_n),
        environment=env, job_dir=args.job_dir, task_name=task_name,
        report=report, initial_params=initial_params,
    )
    return state, history


def _clean_disc_params(p: dict) -> dict:
    """Translate reference YAML discriminator keys to constructor args."""
    return dict(p)


if __name__ == "__main__":
    main()
