"""Device mesh construction and sharding helpers.

The scaling axis of this engine is the BATCH of independent MPC problems /
rollouts (P1, SURVEY.md §2): within a chip vmap fills the MXU, across chips the
batch is sharded over a 1-D (or 2-D batch×host) mesh and XLA inserts the
collectives (psum for reductions, all_gather for result collection) over
ICI/DCN.  Multi-host bootstrap = jax.distributed.initialize() by the launcher.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("batch",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a device mesh over the available devices.

    Default: 1-D mesh named "batch" over all devices — the data-parallel axis
    for independent solves.  Pass shape/axis_names for 2-D (e.g. ("host",
    "batch")) layouts.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def shard_batch(mesh: Mesh, x, axis: str = "batch"):
    """Place a batched array with its leading dim sharded over `axis`."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. the RobotModel) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, sharding)
        if isinstance(leaf, jax.Array) else leaf,
        tree,
    )
