"""Multi-resolution hash-grid encoding (the Instant-NGP workhorse).

Capability parity with tiny-cuda-nn's HashGrid as configured by the reference
(lse_field.py:43-91: 16 levels x 2^19 entries x 2 features, base res 16 ->
max 2048, hash_init_scale 0.001, trilinear interpolation). This is the
dominant compute/bandwidth consumer of the whole model (SURVEY.md section 2c).

TPU-native layout design. TPU tiles the two minor dimensions to (8, 128); any
array whose minor dimension is tiny (like features=2 or corners=8) gets
padded up to 128 lanes — a 16-64x memory blowup that OOMs at production sizes.
So this module keeps the SAMPLE axis minor everywhere:

  - the table parameter is stored transposed as (F, L*T) — gathers produce
    (F, M) with a huge minor dim, and the backward scatter-add lands in the
    same layout;
  - corner indices/weights are built corner-major as (8, L, n) and flattened,
    so the weighted corner reduction is a lane-aligned strided sum;
  - only the final (n, L*F) output has a small minor dim (32 -> one 4x-padded
    small array).

One fused gather serves all levels and corners; XLA lowers it to a single
dynamic-gather and its transpose to one scatter-add, both HBM-bandwidth bound
exactly like the CUDA original.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.ops.fast_gather import take_cols

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
    # "bfloat16" halves gather/sort traffic: params stay float32 (Adam
    # moments keep full precision); the table is cast per step just for the
    # lookup, and gradients accumulate in float32 in the windowed backward
    gather_dtype: str = "float32"

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
    """U(-scale, scale) init (reference lse_field.py:66-67).

    Stored transposed: (features_per_level, table_size * num_levels).
    """
    shape = (config.features_per_level, config.table_size * config.num_levels)
    return (
        jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
        * config.hash_init_scale
    )


def _hash_corners(cx, cy, cz, log2_size: int) -> jnp.ndarray:
    """int32 lattice coords (any shape) -> table indices via XOR-prime hash."""
    h = cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    h = h ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
    h = h ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
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
    L, F, T = config.num_levels, config.features_per_level, config.table_size
    scalings = jnp.asarray(config.scalings(), dtype=jnp.float32)  # (L,)

    # sample-minor coordinate arrays: (L, n) per dimension
    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    sx = px[None, :] * scalings[:, None]
    sy = py[None, :] * scalings[:, None]
    sz = pz[None, :] * scalings[:, None]
    fx_, fy_, fz_ = jnp.floor(sx), jnp.floor(sy), jnp.floor(sz)
    wx, wy, wz = sx - fx_, sy - fy_, sz - fz_  # trilinear fracs (L, n)
    bx, by, bz = fx_.astype(jnp.int32), fy_.astype(jnp.int32), fz_.astype(jnp.int32)

    level_offset = jnp.arange(L, dtype=jnp.int32)[:, None] * T  # (L, 1)

    idx_parts = []
    w_parts = []
    for i in (0, 1):
        cxp = bx + i
        wxp = wx if i else (1.0 - wx)
        for j in (0, 1):
            cyp = by + j
            wyp = wy if j else (1.0 - wy)
            for k in (0, 1):
                czp = bz + k
                wzp = wz if k else (1.0 - wz)
                idx_parts.append(_hash_corners(cxp, cyp, czp,
                                               config.log2_hashmap_size)
                                 + level_offset)  # (L, n)
                w_parts.append(wxp * wyp * wzp)  # (L, n)

    idx_flat = jnp.concatenate(idx_parts, axis=0).reshape(-1)  # (8*L*n,)
    w_flat = jnp.concatenate(w_parts, axis=0).reshape(-1)  # (8*L*n,)

    if config.gather_dtype == "bfloat16":
        table = table.astype(jnp.bfloat16)
    g = take_cols(table, idx_flat)  # (F, 8*L*n) — minor dim huge; fast-scatter bwd
    g = g.astype(jnp.float32)
    gw = g * w_flat[None, :]
    # corner reduction: (F, 8, L*n) -> (F, L*n); minor dim stays L*n
    acc = gw.reshape(F, 8, L * n).sum(axis=1)
    # final (n, L*F): small minor dim only on this compact output array
    return acc.reshape(F, L, n).transpose(2, 1, 0).reshape(n, L * F)
