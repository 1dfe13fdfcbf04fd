"""Ray containers as simple pytrees.

Capability parity with nerfstudio's RayBundle as used by the reference
(lse_cameras.py:579-586): origins, directions, pixel_area, camera_indices,
times, nears/fars, and a metadata dict carrying appearance_id / cam_type /
coords / directions_norm (reference utils.py:182-194). Being flax.struct
dataclasses, bundles flow through jit/vmap/shard_map and can be sharded over
the ray axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct


class HardCamType:
    """Hardware camera type tag (reference lse_cameras.py:19-24)."""

    RGB = 0
    EVS = 1


@struct.dataclass
class RayBundle:
    origins: jnp.ndarray  # (n, 3)
    directions: jnp.ndarray  # (n, 3) unit-norm
    pixel_area: jnp.ndarray  # (n, 1)
    camera_indices: jnp.ndarray  # (n, 1) int32
    times: Optional[jnp.ndarray] = None  # (n, 1)
    nears: Optional[jnp.ndarray] = None  # (n, 1)
    fars: Optional[jnp.ndarray] = None  # (n, 1)
    metadata: Dict[str, Any] = struct.field(default_factory=dict)

    def __len__(self) -> int:
        return self.origins.shape[0]


@struct.dataclass
class RaySamples:
    """Dense per-ray samples: (n_rays, n_samples) with a validity mask.

    The TPU-native replacement for nerfacc's packed (ray_indices, t_starts,
    t_ends) representation (reference lse_grid_estimator.py:93-143): static
    shapes, invalid samples masked instead of dropped.
    """

    positions: jnp.ndarray  # (n, s, 3) world-space sample positions
    directions: jnp.ndarray  # (n, s, 3)
    t_starts: jnp.ndarray  # (n, s)
    t_ends: jnp.ndarray  # (n, s)
    mask: jnp.ndarray  # (n, s) bool, True = real sample
