"""Checkpointing of full GAN training state (orbax) + course-format snapshots.

Mirrors the two reference formats (SURVEY.md §5.4):

1. **Framework format** (trainer/trainerGAN.py:95-149): everything needed to
   resume — generator/discriminator params, both optimizer states, VQ EMA
   state, steps/epochs — stored at ``outdir/checkpoint-<steps>steps`` with a
   ``config.yml`` snapshot beside it (bin/train.py:62-64 contract).
2. **Course format** (train_denoise.py:350-355): generator params only at
   ``job_out/<task>checkpoint-<steps>``.

Orbax writes a directory per checkpoint (not a pickle); paths keep the
reference naming minus the ``.pkl`` suffix.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from dl_speech_enhancement_tpu.utils.config import save_config


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict, config: dict | None = None):
    """Save a pytree ``state`` to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_numpy(state), force=True)
    ckptr.wait_until_finished()
    if config is not None:
        save_config(os.path.join(os.path.dirname(path), "config.yml"), config)


def load_checkpoint(path: str, like: dict | None = None) -> dict:
    """Load a pytree from ``path``. ``like`` (a subtree of the stored
    structure) restores exact dtypes/shapes and supports partial restore
    (e.g. generator params only, the reference's ``load_only_params``
    contract); without it the full stored structure returns as numpy."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = _to_numpy(like)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        ptckptr = ocp.PyTreeCheckpointer()
        restored = ptckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args, partial_restore=True
            ),
        )
        # Pin on device: orbax hands back numpy, and numpy leaves passed to a
        # jitted function re-upload on EVERY call (≈400 ms/step for the full
        # model through the tunneled chip).
        return jax.device_put(restored)
    return ckptr.restore(path)


def latest_checkpoint(outdir: str, pattern: str = r"checkpoint-(\d+)steps") -> str | None:
    """Find the newest ``checkpoint-<N>steps`` directory under ``outdir``."""
    if not os.path.isdir(outdir):
        return None
    best, best_steps = None, -1
    for name in os.listdir(outdir):
        m = re.fullmatch(pattern, name)
        if m and int(m.group(1)) > best_steps:
            best, best_steps = os.path.join(outdir, name), int(m.group(1))
    return best
