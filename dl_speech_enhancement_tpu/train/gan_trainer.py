"""Interval-driven GAN training driver (the reference TrainerGAN core).

Re-designs trainer/trainerGAN.py:24-347 for JAX: the training *step* is a
jitted pure function over an explicit state pytree (params, optimizer states,
VQ EMA state, step counter live on device); the *driver* below handles what
must stay on host — epoch iteration, interval-gated eval/save/log
(trainerGAN.py:316-347), tensorboardX + console logging, checkpoint naming.

Phase switches (discriminator start, encoder freeze) select between a small
set of precompiled step functions by host-side step count — no recompilation
storms, no data-dependent control flow inside jit.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

from dl_speech_enhancement_tpu.train.checkpoint import save_checkpoint, load_checkpoint

logger = logging.getLogger(__name__)


class TrainerGAN:
    """Host-side driver. Subclasses implement ``_train_step(batch)`` /
    ``_eval_step(batch)`` (calling their jitted device steps) and maintain
    ``self.state`` (the device pytree) + ``self.steps``/``self.epochs``."""

    def __init__(self, steps, epochs, data_loader, config):
        from dl_speech_enhancement_tpu.parallel.mesh import mesh_from_config

        self.steps = int(steps)
        self.epochs = int(epochs)
        self.data_loader = data_loader
        self.config = config
        self.train_max_steps = config.get("train_max_steps", 0)
        outdir = config.get("outdir", "exp/unnamed")
        self.writer = SummaryWriter(outdir) if SummaryWriter else None
        self.total_train_loss = defaultdict(float)
        self.total_eval_loss = defaultdict(float)
        self.finish_train = False
        self.state: dict = {}
        # data parallelism from the config (`parallel.data_devices`):
        # state replicated, batches sharded; the jitted workload steps are
        # unchanged — XLA partitions them SPMD over the mesh
        self.mesh = mesh_from_config(config)

    # ------------------------------------------------------------------
    def _shard_state(self):
        """Replicate ``self.state`` over the DP mesh (no-op single-device).
        Workload trainers call this once their state dict is built, and it
        re-runs after a checkpoint restore (restored leaves land on the
        default device)."""
        if self.mesh is not None and self.state:
            from dl_speech_enhancement_tpu.parallel.mesh import (
                shard_train_state,
            )

            self.state = shard_train_state(self.mesh, self.state)

    def _device_batch(self, batch):
        """Batch array(s) → device: sharded over the DP mesh when one is
        configured, plain ``jnp.asarray`` otherwise. Host arrays go
        straight to the mesh sharding (one transfer per shard) — never via
        the default device."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, batch)
        from dl_speech_enhancement_tpu.parallel.mesh import shard_batch

        n = self.mesh.shape["data"]
        for leaf in jax.tree_util.tree_leaves(batch):
            if np.shape(leaf)[0] % n:
                raise ValueError(
                    f"batch size {np.shape(leaf)[0]} is not divisible by "
                    f"parallel.data_devices={n}"
                )
        return shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------
    def _train_step(self, batch):  # pragma: no cover - abstract
        raise NotImplementedError

    def _eval_step(self, batch):  # pragma: no cover - abstract
        raise NotImplementedError

    # ------------------------------------------------------------------
    def run(self):
        self.finish_train = False
        while not self.finish_train:
            self._train_epoch()
        logger.info("Finished training.")

    def _train_epoch(self):
        from dl_speech_enhancement_tpu.data.loader import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            # prefetch straight to the mesh batch sharding — a default-
            # device device_put here would upload the whole batch to one
            # chip and reshard it device-to-device every step
            from dl_speech_enhancement_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
        train_steps_per_epoch = 0
        for train_steps_per_epoch, batch in enumerate(
            prefetch_to_device(self.data_loader["train"], sharding=sharding), 1
        ):
            self._train_step(batch)
            self._check_log_interval()
            self._check_eval_interval()
            self._check_save_interval()
            if self.finish_train:
                return
        if train_steps_per_epoch == 0:
            # An empty epoch would otherwise spin run() forever.
            raise RuntimeError(
                "training epoch yielded no batches — check the data pipeline "
                "(batch_length vs clip lengths, corpus paths)"
            )
        self.epochs += 1
        if train_steps_per_epoch > 200:
            logger.info(
                "(Steps: %d) Finished %d epoch training (%d steps per epoch).",
                self.steps, self.epochs, train_steps_per_epoch,
            )

    def _eval_epoch(self):
        logger.info("(Steps: %d) Start evaluation.", self.steps)
        eval_steps_per_epoch = 0
        for eval_steps_per_epoch, batch in enumerate(self.data_loader["dev"], 1):
            self._eval_step(batch)
        for key in self.total_eval_loss:
            self.total_eval_loss[key] /= max(eval_steps_per_epoch, 1)
            logger.info("(Steps: %d) %s = %.4f.", self.steps, key,
                        self.total_eval_loss[key])
        self._write_to_tensorboard(self.total_eval_loss)
        self.total_eval_loss = defaultdict(float)

    # ------------------------------------------------------------------
    def _record_losses(self, metrics: dict, mode: str = "train"):
        store = self.total_train_loss if mode == "train" else self.total_eval_loss
        for name, value in metrics.items():
            store[f"{mode}/{name}"] += float(value)

    def _write_to_tensorboard(self, losses: dict):
        if self.writer is None:
            return
        for key, value in losses.items():
            self.writer.add_scalar(key, value, self.steps)

    def _check_save_interval(self):
        if self.steps and self.steps % self.config["save_interval_steps"] == 0:
            path = os.path.join(
                self.config["outdir"], f"checkpoint-{self.steps}steps"
            )
            self.save_checkpoint(path)
            logger.info("Successfully saved checkpoint @ %d steps.", self.steps)

    def _check_eval_interval(self):
        if "dev" in self.data_loader and self.steps % self.config["eval_interval_steps"] == 0:
            self._eval_epoch()

    def _check_log_interval(self):
        if self.steps % self.config["log_interval_steps"] == 0:
            interval = self.config["log_interval_steps"]
            for key in self.total_train_loss:
                self.total_train_loss[key] /= interval
                logger.info("(Steps: %d) %s = %.4f.", self.steps, key,
                            self.total_train_loss[key])
            self._write_to_tensorboard(self.total_train_loss)
            self.total_train_loss = defaultdict(float)

    def _check_train_finish(self):
        if self.steps >= self.train_max_steps:
            self.finish_train = True
        return self.finish_train

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        state = dict(self.state)
        state["steps"] = self.steps
        state["epochs"] = self.epochs
        save_checkpoint(path, state, config=self.config)

    def load_checkpoint(self, path: str, load_only_params: bool = False,
                        load_discriminator: bool = True):
        """Restore training state (trainerGAN.py:124-149 contract):
        ``load_only_params`` skips optimizer states and counters;
        ``load_discriminator=False`` keeps the discriminator's optimizer
        state fresh (params still load)."""
        like = dict(self.state)
        like["steps"] = self.steps
        like["epochs"] = self.epochs
        restored = load_checkpoint(path, like=like)
        if load_only_params:
            for key in ("params_generator", "params_discriminator", "vq_state"):
                if key in restored and key in self.state:
                    self.state[key] = restored[key]
        else:
            self.steps = int(restored.pop("steps", self.steps))
            self.epochs = int(restored.pop("epochs", self.epochs))
            if not load_discriminator:
                restored.pop("opt_discriminator", None)
            for key, value in restored.items():
                if key in self.state:
                    self.state[key] = value
        self._shard_state()
