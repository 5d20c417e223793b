"""Import a reference (torch) checkpoint pickle into this framework's format.

Lets a user of the reference repo bring trained models across::

    python -m dl_speech_enhancement_tpu.cli.import_checkpoint \\
        --checkpoint exp/.../checkpoint-200000steps.pkl \\
        --config configs/autoencoder/symAD_vctk_48000_hop300.yaml \\
        --out exp/imported/checkpoint-200000steps

Both reference pickle formats are handled (SURVEY.md §5.4):

- **framework format** (trainer/trainerGAN.py:95-121): generator +
  discriminator params, VQ EMA state and step/epoch counters are imported
  (torch Adam moments are NOT translated to optax state — resume with
  ``--resume ... load_only_params`` semantics, i.e. fresh optimizers);
- **course format** (train_denoise.py:350-355): a bare generator state_dict —
  imported as ``params_generator`` only (warm-start via the course configs'
  ``initial_model`` key, or use directly for inference/streaming).

The output is an orbax checkpoint directory with a ``config.yml`` snapshot
beside it (the load-config-beside-checkpoint contract, bin/test.py:47-52),
loadable by every consumer in this framework: the train CLIs' ``--resume``,
the AudioDec facade, cli/test.py and the streaming runtime.

If the checkpoint is a HiFiGAN vocoder carrying analyzer-statistics buffers
(``mean``/``scale``), they are extracted to ``stats_imported.npy`` beside the
checkpoint — point ``generator_params.stats`` at that file.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--checkpoint", required=True,
                        help="reference .pkl (framework or course format)")
    parser.add_argument("--config", required=True,
                        help="experiment YAML describing the model topology "
                        "(same schema as the reference config/**)")
    parser.add_argument("--out", required=True,
                        help="output checkpoint directory (orbax)")
    parser.add_argument("--without-pqc", action="store_true",
                        help="the checkpoint is the course's without-PQC "
                        "generator (projector/quantizer/decoder input conv "
                        "present in the pickle but unused are skipped)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import jax

    from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint
    from dl_speech_enhancement_tpu.utils.config import load_config
    from dl_speech_enhancement_tpu.utils.model_factory import (
        build_discriminator,
        build_generator,
    )
    from dl_speech_enhancement_tpu.utils.torch_import import (
        import_audiodec_generator,
        import_hifigan_discriminator,
        import_hifigan_generator,
        import_univnet_discriminator,
        load_torch_pickle,
    )

    config = load_config(args.config)
    # course configs (config/denoise/symAD_*.yaml) carry no model_type — the
    # course loop always trains the symAD generator (train_denoise.py:93-94)
    model_type = config.get("model_type", "symAudioDec")
    ckpt = load_torch_pickle(args.checkpoint)

    if isinstance(ckpt, dict) and "model" in ckpt:
        fmt = "framework"
        gen_sd = ckpt["model"]["generator"]
        disc_sd = ckpt["model"].get("discriminator")
        steps = int(ckpt.get("steps", 0))
        epochs = int(ckpt.get("epochs", 0))
    else:
        fmt = "course"
        gen_sd, disc_sd, steps, epochs = ckpt, None, 0, 0
    logger.info("checkpoint format: %s (%d generator tensors)",
                fmt, len(gen_sd))

    state = {}
    if model_type in ("symAudioDec", "symAudioDecUniv"):
        gen = build_generator(model_type, config["generator_params"],
                              use_pqc=not args.without_pqc)
        params, vq_state = import_audiodec_generator(gen_sd, gen)
        state["params_generator"] = params
        if vq_state is not None:
            state["vq_state"] = vq_state
    elif model_type in ("HiFiGAN", "UnivNet"):
        gen = build_generator(model_type, dict(config["generator_params"],
                                               stats=None))
        params, stats = import_hifigan_generator(gen_sd, gen)
        state["params_generator"] = params
        if stats is not None:
            stats_path = os.path.join(
                os.path.dirname(os.path.abspath(args.out)),
                "stats_imported.npy")
            os.makedirs(os.path.dirname(stats_path), exist_ok=True)
            np.save(stats_path, stats)
            logger.info("input-norm stats -> %s (set generator_params.stats)",
                        stats_path)
    else:
        raise NotImplementedError(f"Model type: {model_type} is not supported!")

    if disc_sd is not None:
        disc = build_discriminator(model_type, config["discriminator_params"])
        if model_type in ("symAudioDec", "HiFiGAN"):
            state["params_discriminator"] = import_hifigan_discriminator(
                disc_sd, disc)
        else:
            state["params_discriminator"] = import_univnet_discriminator(
                disc_sd, disc)

    if fmt == "framework":
        state["steps"] = steps
        state["epochs"] = epochs

    save_checkpoint(args.out, state, config=config)
    n_params = sum(
        int(np.prod(np.shape(leaf)))
        for leaf in jax.tree_util.tree_leaves(state["params_generator"])
    )
    logger.info("imported %s -> %s (keys: %s; generator params: %.2fM)",
                args.checkpoint, args.out, sorted(state), n_params / 1e6)


if __name__ == "__main__":
    main()
