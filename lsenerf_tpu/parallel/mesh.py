"""Device-mesh data parallelism for the train step.

Capability parity with the reference's only parallelism strategy — DP via one
process per GPU + DDP gradient all-reduce (train.py:114-234,
lse_pipeline.py:96-98; SURVEY.md section 2d) — done the TPU way:

  - a 1-D `jax.sharding.Mesh` over all local devices (ICI within a slice)
  - the ray batch sharded along axis 0 on the "data" axis
  - params / optimizer state / occupancy grid replicated
  - ONE jitted train step; XLA inserts the gradient all-reduce (psum over ICI)
    automatically because replicated params consume sharded batch data —
    "computation follows data", no NCCL/DDP wrapper, no unused-parameter
    special case (static config already compiled the union of branches)

Multi-host: `jax.distributed.initialize()` + per-host batch slices extend the
same mesh over DCN; the step function is unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data"):
    """Shard every batch array along its leading (ray) axis.

    Ray counts must divide the mesh size — use `round_rays_to_mesh` on the
    DataManagerConfig budget.
    """
    n_dev = mesh.devices.size

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_dev == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return {k: place(v) for k, v in batch.items()}


def round_rays_to_mesh(dm_config, mesh: Mesh):
    """Round the per-branch ray budgets down to multiples of the mesh size
    (replaces the reference's per-rank independent sampling)."""
    n = mesh.devices.size
    dm_config.train_num_col_rays_per_batch -= (
        dm_config.train_num_col_rays_per_batch % n
    )
    dm_config.train_num_evs_rays_per_batch -= (
        dm_config.train_num_evs_rays_per_batch % n
    )
    return dm_config
