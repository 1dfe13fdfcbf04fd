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

from lsenerf_tpu.ops.fast_gather import take_cols, take_rows_blocked

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
    # Table layout. "ngp" is the reference-exact per-vertex hash (tcnn
    # HashGrid semantics, 8 gathers per sample-level). "blocked" is the
    # TPU-first layout: vertices grouped into overlapping 3x3x3 blocks keyed
    # by the half-resolution cell, so every sample-level needs exactly ONE
    # row gather — and TPU row gathers cost the same ~6 ns whether the row
    # is 2 floats or 64 (latency-bound, measured on v5e). Same parameter
    # budget; collisions act on blocks instead of single vertices.
    layout: str = "ngp"
    # log2 of hashed rows per level in blocked layout; 2^14 rows x 64 floats
    # per level == the reference's 2^19 entries x 2 floats per level.
    blocked_rows_log2: int = 14

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def blocked_row_width(self) -> int:
        """27 vertices x F features, padded to a multiple of 32 lanes."""
        return ((27 * self.features_per_level + 31) // 32) * 32

    def scalings(self) -> np.ndarray:
        """Per-level grid resolutions: floor(base * growth^level)
        (reference lse_field.py:60-63)."""
        growth = np.exp(
            (np.log(self.max_res) - np.log(self.base_res)) / (self.num_levels - 1)
        )
        return np.floor(self.base_res * growth ** np.arange(self.num_levels))

    def blocked_level_rows(self) -> np.ndarray:
        """Rows per level: dense block lattice when it fits, else hashed."""
        n_hash = 2**self.blocked_rows_log2
        bd = self.blocked_level_bdims()
        return np.minimum(bd**3, n_hash)

    def blocked_level_bdims(self) -> np.ndarray:
        """Block-lattice extent per dim per level: ceil(R / 2) for cube
        bases b in [0, R-1], block key k = b >> 1."""
        res = self.scalings().astype(np.int64)
        return (res - 1) // 2 + 1


def init_hash_table(key: jax.Array, config: HashEncodingConfig) -> jnp.ndarray:
    """U(-scale, scale) init (reference lse_field.py:66-67).

    "ngp" layout: stored transposed (features_per_level, table_size * L).
    "blocked" layout: (total_rows, row_width) — one row per 3x3x3 block.
    """
    if config.layout == "blocked":
        total_rows = int(config.blocked_level_rows().sum())
        shape = (total_rows, config.blocked_row_width)
    else:
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


def hash_encode_blocked(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Blocked-layout encode: (n, 3) in [0,1]^3 -> (n, L*F).

    TPU-first reformulation of the tcnn HashGrid lookup
    (reference lse_field.py:72-91). Instead of hashing each of the 8
    interpolation-cube corners independently (8 random gathers per
    sample-level; TPU gathers are latency-bound at ~6 ns per ROW regardless
    of width), vertices are grouped into overlapping 3x3x3 blocks keyed by
    k = floor(cube_base / 2). For ANY cube base b, the corners {b, b+1} lie
    inside block k's vertex range [2k, 2k+2], so ONE row gather of
    27xF floats serves the whole trilinear stencil: an 8x reduction in
    gather rows for identical parameter count.

    Field semantics note: overlapping blocks mean an even-lattice vertex is
    represented in up to 8 hashed rows; which copy a sample reads is a
    deterministic function of its cube base, so the field stays well-defined
    (piecewise-trilinear per block choice). Collisions alias whole blocks
    rather than single vertices; total capacity matches the reference
    (2^14 rows x 64 floats == 2^19 entries x 2 floats per level).

    Differentiable in the table (row scatter-add backward) and in positions
    (through the trilinear weights), exactly like the ngp layout.
    """
    n = positions.shape[0]
    L, F = config.num_levels, config.features_per_level
    Wrow = config.blocked_row_width
    n_hash = 2**config.blocked_rows_log2

    scalings = jnp.asarray(config.scalings(), jnp.float32)[:, None]  # (L,1)
    res_i = jnp.asarray(config.scalings().astype(np.int64), jnp.int32)[:, None]
    bdims = jnp.asarray(config.blocked_level_bdims(), jnp.int32)[:, None]
    level_rows = config.blocked_level_rows()
    dense_mask = jnp.asarray(level_rows < n_hash)[:, None]  # (L,1) bool
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum(level_rows)[:-1]]).astype(np.int32)
    )[:, None]  # (L,1)

    # sample-minor (L, n) everywhere
    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    coords = []
    for p in (px, py, pz):
        s = p[None, :] * scalings  # (L, n)
        b = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, res_i - 1)
        w = s - b.astype(jnp.float32)  # trilinear frac in [0,1]
        coords.append((b >> 1, b & 1, w))
    (kx, ox, wx), (ky, oy, wy), (kz, oz, wz) = coords

    key_dense = (kx * bdims + ky) * bdims + kz
    h = kx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    h = h ^ (ky.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
    h = h ^ (kz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    key_hash = (h & jnp.uint32(n_hash - 1)).astype(jnp.int32)
    keys = jnp.where(dense_mask, key_dense, key_hash) + offsets  # (L, n)

    if config.gather_dtype == "bfloat16":
        table = table.astype(jnp.bfloat16)
    rows = take_rows_blocked(table, keys.reshape(-1))  # (L*n, Wrow)
    rowsT = rows.T.astype(jnp.float32)  # (Wrow, m) — sample axis minor
    rows27 = rowsT[: 27 * F].reshape(27, F, L * n)

    # per-dim weight over block-relative vertex positions {0,1,2}:
    # cube base at parity o contributes (1-w) to slot o and w to slot o+1
    def dim_weights(o, w):
        o = o.astype(jnp.float32).reshape(-1)
        w = w.reshape(-1)
        return jnp.stack(
            [
                (1.0 - w) * (1.0 - o),
                w * (1.0 - o) + (1.0 - w) * o,
                w * o,
            ]
        )  # (3, m)

    ux, uy, uz = dim_weights(ox, wx), dim_weights(oy, wy), dim_weights(oz, wz)
    w27 = (
        ux[:, None, None, :] * uy[None, :, None, :] * uz[None, None, :, :]
    ).reshape(27, 1, L * n)

    feats = (rows27 * w27).sum(axis=0)  # (F, m)
    return feats.reshape(F, L, n).transpose(2, 1, 0).reshape(n, L * F)


def hash_encode(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Encode (n, 3) positions in [0,1]^3 -> (n, L*F) features.

    Differentiable in both the table (scatter-add backward) and the positions
    (through the trilinear weights) — position gradients are what let camera
    poses train through the field.
    """
    if config.layout == "blocked":
        return hash_encode_blocked(table, positions, config)
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
