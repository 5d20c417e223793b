"""Device mesh + sharding helpers — data parallelism over ICI.

The reference trains single-device only (SURVEY.md §2.3); here DP is
first-class: a 1-D (or 2-D, with an unused ``model`` axis reserved for
future tensor parallelism) ``jax.sharding.Mesh``, batches sharded over the
``data`` axis, parameters/optimizer state replicated. Train steps are plain
jitted functions over global arrays — XLA inserts the gradient ``psum`` and
keeps the EMA codebook statistics identical on every replica, so the
single-chip step functions work unchanged under the mesh (pjit-style SPMD,
not shard_map).

Multi-chip hardware is not available in CI; tests and the driver's
``dryrun_multichip`` exercise this on a virtual 8-device CPU backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("data",)) -> Mesh:
    """1-D data mesh by default; pass axes=("data", "model") to reserve a
    model axis (sized 1 unless n_devices is a tuple)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axes) == 1:
        return Mesh(devices, axes)
    assert len(axes) == 2
    return Mesh(devices.reshape(n_devices, 1), axes)


def mesh_from_config(config: dict) -> Mesh | None:
    """Build the data mesh requested by ``config['parallel']`` — the
    config-surface for DP training (an additive extension of the reference
    YAML schema; absent section means single-device, like the reference):

    .. code-block:: yaml

        parallel:
          data_devices: -1   # N data-parallel devices; -1 = all; 0/1 = off

    Returns ``None`` when DP is off. The trainers replicate their state and
    shard batches over the returned mesh (``shard_train_state`` /
    ``shard_batch``); the jitted step functions themselves are unchanged —
    XLA partitions them SPMD and inserts the gradient/EMA reductions.
    """
    n = int((config.get("parallel") or {}).get("data_devices", 1) or 1)
    if n < 0:
        n = len(jax.devices())
    if n <= 1:
        return None
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(
            f"parallel.data_devices={n} but only {avail} devices are visible"
        )
    return make_mesh(n)


def shard_batch(mesh: Mesh, batch):
    """Shard array(s) batch-first over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_train_state(mesh: Mesh, state: dict) -> dict:
    """Replicate a train-state pytree over the mesh (params + opt states +
    VQ EMA state are small for this model family — DP keeps them whole)."""
    return replicate(mesh, state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
