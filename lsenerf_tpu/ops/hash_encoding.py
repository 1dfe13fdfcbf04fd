"""Multi-resolution hash-grid encoding (the Instant-NGP workhorse).

Capability parity with tiny-cuda-nn's HashGrid as configured by the reference
(lse_field.py:43-91: 16 levels x 2^19 entries x 2 features, base res 16 ->
max 2048, hash_init_scale 0.001, trilinear interpolation). This is the
dominant compute/bandwidth consumer of the whole model (SURVEY.md section 2c).

TPU-native design: one fused gather over a single (L*T, F) table for all
levels and all 8 corners at once — XLA lowers this to a single large dynamic
gather, and the backward pass to one scatter-add, both HBM-bandwidth bound
exactly like the CUDA original. Corner hashing uses the NGP XOR-prime scheme.
A Pallas double-buffered variant can slot in behind the same function
signature later; numerics are defined by this module.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# NGP spatial hash primes (pi1=1 keeps x-major locality at low resolutions)
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashEncodingConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    hash_init_scale: float = 0.001

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def scalings(self) -> np.ndarray:
        """Per-level grid resolutions: floor(base * growth^level)
        (reference lse_field.py:60-63)."""
        growth = np.exp(
            (np.log(self.max_res) - np.log(self.base_res)) / (self.num_levels - 1)
        )
        return np.floor(self.base_res * growth ** np.arange(self.num_levels))


def init_hash_table(key: jax.Array, config: HashEncodingConfig) -> jnp.ndarray:
    """U(-scale, scale) init (reference lse_field.py:66-67)."""
    shape = (config.table_size * config.num_levels, config.features_per_level)
    return (
        jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
        * config.hash_init_scale
    )


def _hash_corners(corners: jnp.ndarray, log2_size: int) -> jnp.ndarray:
    """(..., 3) int32 lattice coords -> (...,) table indices via XOR-prime hash."""
    c = corners.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(2**log2_size - 1)).astype(jnp.int32)


def hash_encode(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Encode (n, 3) positions in [0,1]^3 -> (n, L*F) features.

    Differentiable in both the table (scatter-add backward) and the positions
    (through the trilinear weights) — position gradients are what let camera
    poses train through the field.
    """
    n = positions.shape[0]
    L, F = config.num_levels, config.features_per_level
    scalings = jnp.asarray(config.scalings(), dtype=jnp.float32)  # (L,)

    scaled = positions[None, :, :] * scalings[:, None, None]  # (L, n, 3)
    floor = jnp.floor(scaled)
    frac = scaled - floor  # (L, n, 3) trilinear weights
    base = floor.astype(jnp.int32)

    # 8 corner offsets (static)
    offsets = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
    )  # (8, 3)
    corners = base[:, :, None, :] + offsets[None, None, :, :]  # (L, n, 8, 3)

    idx = _hash_corners(corners, config.log2_hashmap_size)  # (L, n, 8)
    level_offset = (
        jnp.arange(L, dtype=jnp.int32)[:, None, None] * config.table_size
    )
    flat_idx = (idx + level_offset).reshape(-1)  # (L*n*8,)

    feats = jnp.take(table, flat_idx, axis=0).reshape(L, n, 8, F)

    # trilinear blend: weight per corner = prod over dims of (frac or 1-frac)
    w = jnp.where(
        offsets[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :]
    ).prod(axis=-1)  # (L, n, 8)

    out = jnp.sum(feats * w[..., None], axis=2)  # (L, n, F)
    return jnp.moveaxis(out, 0, 1).reshape(n, L * F)
