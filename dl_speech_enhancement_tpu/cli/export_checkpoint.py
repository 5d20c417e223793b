"""Export a checkpoint of this framework as a reference (torch) pickle.

The inverse of cli/import_checkpoint.py — models trained here can be
deployed or fine-tuned with the reference stack::

    python -m dl_speech_enhancement_tpu.cli.export_checkpoint \\
        --checkpoint exp/denoise/<tag>/checkpoint-200000steps \\
        --out exp/exported/checkpoint-200000steps.pkl

Both reference pickle formats are written (SURVEY.md §5.4):

- ``--format course`` (default when the checkpoint has no discriminator): a
  bare generator ``state_dict`` (train_denoise.py:350-355) — load it with
  the reference course loop's ``initial_model`` key or ``torch.load`` +
  ``Generator.load_state_dict``.
- ``--format framework``: the trainer dict (trainer/trainerGAN.py:95-121)
  with generator + discriminator state_dicts and steps/epochs. Optimizer /
  scheduler states are NOT translated (optax ≠ torch Adam moments) — resume
  on the reference side with ``load_only_params``.

The model topology comes from the ``config.yml`` saved beside the
checkpoint (or ``--config``). Without-PQC generators get seeded-random
placeholder projector/quantizer entries — the reference module constructs
(and ignores) them, exactly like its own course checkpoints. Weights
round-trip bit-exactly (tests/test_torch_export.py loads the exports into
the reference's own modules with ``strict=True`` and compares forwards).
"""

from __future__ import annotations

import argparse
import logging
import os

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--checkpoint", required=True,
                        help="orbax checkpoint directory (this framework)")
    parser.add_argument("--config", default=None,
                        help="experiment YAML (default: config.yml beside "
                        "the checkpoint)")
    parser.add_argument("--out", required=True,
                        help="output .pkl path (torch.save)")
    parser.add_argument("--format", choices=("auto", "course", "framework"),
                        default="auto",
                        help="'course' = bare generator state_dict; "
                        "'framework' = trainer dict incl. discriminator; "
                        "'auto' picks framework iff a discriminator is "
                        "present")
    parser.add_argument("--without-pqc", action="store_true",
                        help="the checkpoint is a without-PQC (denoiser) "
                        "generator")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import numpy as np
    import torch

    from dl_speech_enhancement_tpu.nn.vq import VQState
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.utils.config import (
        load_config,
        load_config_beside,
    )
    from dl_speech_enhancement_tpu.utils.model_factory import (
        build_discriminator,
        build_generator,
    )
    from dl_speech_enhancement_tpu.utils.torch_export import (
        export_audiodec_generator,
        export_hifigan_discriminator,
        export_hifigan_generator,
        export_univnet_discriminator,
    )

    config = (load_config(args.config) if args.config
              else load_config_beside(args.checkpoint))
    model_type = config.get("model_type", "symAudioDec")
    state = load_checkpoint(args.checkpoint)
    if "params_generator" not in state:
        raise SystemExit(
            f"checkpoint {args.checkpoint} has no params_generator "
            f"(keys: {sorted(state)})")

    use_pqc = not args.without_pqc
    if model_type in ("symAudioDec", "symAudioDecUniv"):
        gen = build_generator(model_type, config["generator_params"],
                              use_pqc=use_pqc)
        vq = state.get("vq_state")
        if isinstance(vq, dict):
            vq = VQState(**{k: np.asarray(v) for k, v in vq.items()})
        if use_pqc and vq is None:
            raise SystemExit("PQC checkpoint without vq_state — pass "
                             "--without-pqc for denoiser checkpoints")
        gen_sd = export_audiodec_generator(
            state["params_generator"], vq, gen,
            generator_config=config["generator_params"])
    elif model_type in ("HiFiGAN", "UnivNet"):
        gen = build_generator(model_type, config["generator_params"])
        gen_sd = export_hifigan_generator(state["params_generator"], gen)
    else:
        raise NotImplementedError(f"Model type: {model_type} is not supported!")

    fmt = args.format
    if fmt == "auto":
        fmt = ("framework" if "params_discriminator" in state else "course")

    def to_torch(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if fmt == "course":
        torch.save(to_torch(gen_sd), args.out)
        logger.info("exported course-format generator state_dict "
                    "(%d tensors) -> %s", len(gen_sd), args.out)
        return

    out = {"model": {"generator": to_torch(gen_sd)},
           "optimizer": {}, "scheduler": {},
           "steps": int(state.get("steps", 0)),
           "epochs": int(state.get("epochs", 0))}
    if "params_discriminator" in state:
        disc = build_discriminator(model_type, config["discriminator_params"])
        export_disc = (export_univnet_discriminator
                       if model_type in ("symAudioDecUniv", "UnivNet")
                       else export_hifigan_discriminator)
        out["model"]["discriminator"] = to_torch(
            export_disc(state["params_discriminator"], disc))
    torch.save(out, args.out)
    logger.info("exported framework-format checkpoint (%s) -> %s "
                "(reference side: load with load_only_params — optimizer "
                "state is not translated)", sorted(out["model"]), args.out)


if __name__ == "__main__":
    main()
