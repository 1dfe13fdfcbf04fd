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

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.ops import fast_gather
from lsenerf_tpu.ops.fast_gather import (
    sorted_window_accumulate_factored,
    take_cols,
    take_rows_blocked,
)

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
    # Table-gradient path for the blocked layout. "factored" sorts the 5
    # scalar gradient factors per update as sort payload and rebuilds the
    # 64-wide rank-1 update rows inside each accumulate window (saves the
    # ~16 ns/row sorted-permute gather of materialized rows); "autodiff"
    # keeps the materialized-row path (used as the oracle in tests).
    blocked_backward: str = "factored"
    # Trilinear-combine implementation for the blocked layout: "pallas"
    # fuses the 27-vertex weight contraction into one memory pass; "xla"
    # keeps the jnp path; "auto" probes the Mosaic toolchain (subprocess,
    # timeout-guarded — the remote compiler sometimes hangs) and falls
    # back. Default "xla": measured step-level NEUTRAL on this chip (XLA
    # already fuses the combine inside the full train step; the 13.8 ms
    # isolated-stage cost does not survive in-step fusion) while the
    # toolchain risk is real. Revisit if a future toolchain compiles it
    # reliably.
    combine_impl: str = "xla"
    # Sort the backward's update keys as one batched per-level sort instead
    # of one global sort (exact — level-major keys are range-partitioned by
    # the cumulative row offsets, so concatenated per-level sorts ARE the
    # global sort). In theory ~34% less bitonic depth; MEASURED SLOWER on
    # v5e (56.4k vs 58.1k rays/s, scripts/ab_bench.py global_sort vs
    # segmented_sort) — XLA's batched sort does not vectorize the batch dim
    # the way the depth argument assumes. Kept as an A/B knob; default off.
    segmented_sort: bool = False
    # Minimum row count at which a level may take the SORTED windowed
    # gradient path. Every DENSE-KEYED level (rows < 2^blocked_rows_log2)
    # always takes an EXACT per-level one-hot matmul regardless of this
    # value: dense keys are spatially correlated (occupancy-clustered
    # samples concentrate updates on few rows), so the windowed path's
    # per-window update cap would silently drop gradient tails — a ~4x
    # gradient subsample at level 0 flagship scale, and the same failure
    # mode at ANY dense level (e.g. the 21^3=9261-row res-42 level at
    # flagship config). Hashed levels spread keys near-uniformly, where the
    # 3x-mean cap needs a >3x hot spot to overflow; blocked_overflow_count
    # provides runtime telemetry for that residual risk. Raising this above
    # 2^blocked_rows_log2 additionally forces hashed levels onto the exact
    # path (slow; oracle/testing use).
    dense_grad_rows: int = 4096
    # Windowed-accumulate tiling for the hashed-level table gradient. Total
    # one-hot matmul work is sum_w(window x max_updates x row_width) MACs
    # = (max_updates_factor x m) x window x row_width — it scales LINEARLY
    # with `window` — while the sequential lax.map iteration count is
    # n_windows / batch_windows. Tuned on chip (scripts/tune_accumulate.py,
    # ab_bench acc_* variants); see the call-site comment for measurements.
    accum_window: int = 512
    accum_batch_windows: int = 32
    # FORWARD lookups for levels with at most this many rows go through a
    # fused one-hot MXU matmul instead of the row gather. TPU row gathers
    # are latency-bound (~6-10 ns/row) while the MXU is nearly idle, so
    # levels with small tables trade dead gather latency for almost-free
    # matmul FLOPs (n x rows x 64). 0 disables (plain gather for all
    # levels).
    dense_fwd_rows: int = 0
    # Active level window [level_lo, level_hi) of the full ladder
    # (level_hi=0 means num_levels). Grid geometry (scalings, row offsets,
    # table shape, gradient shape) stays GLOBAL, so for any split point C
    # concat(encode[0:C], encode[C:L]) == encode[0:L] exactly, forward and
    # backward. Used by the strided coarse-level sampling path
    # (models/field.field_apply_strided): coarse levels vary over >=4
    # samples (round-3 scripts/measure_dedup.py: distinct-key fraction 0.23
    # at level 0), so they are encoded at ray anchors only and lerped along
    # the sample axis while fine levels keep the full rate.
    level_lo: int = 0
    level_hi: int = 0
    # Mesh axis over which the table-gradient accumulate is shard-mapped
    # (each device sorts/accumulates its slice of the update stream; one
    # table psum replaces GSPMD's replicated-backward all-gathers). Takes
    # effect iff the AMBIENT mesh (jax.set_mesh / parallel.mesh.activate,
    # called by parallel.mesh.replicate) carries this axis with size > 1 at
    # trace time — and jit keys its trace cache on the ambient mesh, so the
    # decision can never go stale across calls. "" disables.
    dp_axis: str = "data"

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def active_range(self) -> tuple:
        """(lo, hi) of the active level window; hi=0 means num_levels."""
        hi = self.level_hi if self.level_hi > 0 else self.num_levels
        return self.level_lo, hi

    @property
    def out_dim(self) -> int:
        lo, hi = self.active_range
        return (hi - lo) * self.features_per_level

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


def _dense_level_count(config: HashEncodingConfig) -> int:
    """Number of leading levels routed through the EXACT one-hot gradient.

    Every dense-keyed level (rows < 2^blocked_rows_log2) qualifies
    unconditionally — dense keys are spatially correlated and can exceed any
    per-window update cap in the sorted path (silent gradient drops).
    dense_grad_rows can only WIDEN the prefix (testing/oracle use);
    dense_grad_rows=0 used to disable the path entirely, kept for tests.

    Counts within the ACTIVE level window (level_lo:level_hi)."""
    lo, hi = config.active_range
    level_rows = config.blocked_level_rows()[lo:hi]
    if config.dense_grad_rows <= 0:
        return 0
    n_hash = 2**config.blocked_rows_log2
    cut = max(n_hash, config.dense_grad_rows + 1)
    return int(np.searchsorted(level_rows, cut))


def blocked_overflow_count(
    positions: jnp.ndarray,
    config: HashEncodingConfig,
    window: int = 512,
    max_updates_factor: int = 3,
) -> jnp.ndarray:
    """Telemetry: how many table-gradient updates the sorted windowed
    accumulate WOULD drop for this batch of (contracted, unit-cube)
    positions (VERDICT r2 weak #4: the overflow contract was previously
    unobservable at runtime).

    Counts, per accumulate window over the hashed-level key range, the
    updates beyond the per-window cap — the same `window`/
    `max_updates_factor` constants as the gradient path in
    `_blocked_fast_fn.bwd`. Pure function of the keys, so it runs in the
    forward pass and can be surfaced as a train metric. 0 == the backward
    was exact for this batch.
    """
    from lsenerf_tpu.ops.fast_gather import window_overflow_count

    level_rows = config.blocked_level_rows()
    dense_L = _dense_level_count(config)
    L = config.num_levels
    if dense_L >= L:
        return jnp.zeros((), jnp.int32)
    dense_total = int(level_rows[:dense_L].sum())
    total_rows = int(level_rows.sum())
    keys = _blocked_keys_fracs(positions, config)[0]
    keys_h = keys[dense_L:].reshape(-1) - dense_total
    m = keys_h.shape[0]
    n_windows = -(-(total_rows - dense_total) // window)
    mean_per_window = max(1, m // n_windows)
    max_updates = min(
        _ru256(max(window, max_updates_factor * mean_per_window)),
        _ru256(m),
    )
    return window_overflow_count(
        keys_h, total_rows - dense_total, window, max_updates
    )


def _ru256(x: int) -> int:
    return ((x + 255) // 256) * 256


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


def _blocked_keys_fracs(positions: jnp.ndarray, config: HashEncodingConfig):
    """(n, 3) positions -> global row keys (L, n) + per-dim (parity o, frac w),
    each (L, n). Shared by the autodiff and factored-backward paths."""
    lo, hi = config.active_range
    n_hash = 2**config.blocked_rows_log2

    scalings = jnp.asarray(config.scalings()[lo:hi], jnp.float32)[:, None]  # (L,1)
    res_i = jnp.asarray(
        config.scalings().astype(np.int64)[lo:hi], jnp.int32
    )[:, None]
    bdims = jnp.asarray(config.blocked_level_bdims()[lo:hi], jnp.int32)[:, None]
    level_rows_full = config.blocked_level_rows()
    level_rows = level_rows_full[lo:hi]
    dense_mask = jnp.asarray(level_rows < n_hash)[:, None]  # (L,1) bool
    # row offsets stay GLOBAL into the full table
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum(level_rows_full)[:-1]])
        .astype(np.int32)[lo:hi]
    )[:, None]  # (L,1)

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
    return keys, (ox, wx), (oy, wy), (oz, wz)


def _dim_weights(o, w):
    """Per-dim weight over block-relative vertex slots {0,1,2}: a cube base
    at parity o contributes (1-w) to slot o and w to slot o+1.

    Shape-agnostic: o/w of any (broadcast-compatible) shape -> (3, *shape).
    Callers pass FLAT (u,) windows in the sorted backward but STRUCTURED
    (L, n) arrays in the sharded encode — flattening here would merge the
    unsharded level axis with the ray-sharded sample axis, which GSPMD
    tiling cannot express and resolves by replicating (all-gathers of every
    per-sample array, scripts/psum_accounting.py)."""
    o = o.astype(jnp.float32)
    w = w * jnp.ones_like(o)
    return jnp.stack(
        [
            (1.0 - w) * (1.0 - o),
            w * (1.0 - o) + (1.0 - w) * o,
            w * o,
        ]
    )  # (3, *shape)


def _blocked_combine(rows, ox, wx, oy, wy, oz, wz, n, config):
    """(m, Wrow) gathered rows + per-dim fracs -> (n, L*F) features.

    Flat-m formulation, kept for the autodiff/oracle blocked path
    (hash_encode_blocked) and probes; the custom-vjp fast path uses
    _blocked_combine_struct, which keeps (L, n) axes for GSPMD."""
    lo, hi = config.active_range
    L, F = hi - lo, config.features_per_level
    rowsT = rows.T.astype(jnp.float32)  # (Wrow, m) — sample axis minor
    rows27 = rowsT[: 27 * F].reshape(27, F, L * n)
    ux = _dim_weights(ox.reshape(-1), wx.reshape(-1))
    uy = _dim_weights(oy.reshape(-1), wy.reshape(-1))
    uz = _dim_weights(oz.reshape(-1), wz.reshape(-1))
    w27 = (
        ux[:, None, None, :] * uy[None, :, None, :] * uz[None, None, :, :]
    ).reshape(27, 1, L * n)
    feats = (rows27 * w27).sum(axis=0)  # (F, m)
    return feats.reshape(F, L, n).transpose(2, 1, 0).reshape(n, L * F)


def _blocked_combine_struct(rows, ox, wx, oy, wy, oz, wz, config):
    """(L, n, Wrow) gathered rows + per-dim (L, n) fracs -> (n, L*F).

    Level and sample stay REAL array axes end to end: under a DP mesh the
    sample axis carries the batch's ray sharding, and any reshape that
    merges it with the level axis is inexpressible in GSPMD tiling — the
    partitioner replicates instead (measured: every per-sample (L, n) array
    all-gathered, scripts/psum_accounting.py). Values are bit-identical to
    the old flat-m formulation; only the axis bookkeeping differs."""
    L, n, _ = rows.shape
    F = config.features_per_level
    rows27 = (
        rows[..., : 27 * F].astype(jnp.float32)
        .reshape(L, n, 27, F)
        .transpose(2, 3, 0, 1)
    )  # (27, F, L, n)
    ux, uy, uz = _dim_weights(ox, wx), _dim_weights(oy, wy), _dim_weights(oz, wz)
    w27 = (
        ux[:, None, None] * uy[None, :, None] * uz[None, None, :]
    ).reshape(27, 1, L, n)
    feats = (rows27 * w27).sum(axis=0)  # (F, L, n)
    return feats.transpose(2, 1, 0).reshape(n, L * F)


@functools.lru_cache(maxsize=None)
def _blocked_fast_fn(config: HashEncodingConfig):
    """custom_vjp blocked encode with the factored table-gradient backward.

    Forward = plain row gather + trilinear combine. Backward:
      - position grads from the saved rows (exact f32 math, as autodiff);
      - table grad WITHOUT materializing/permuting (m, 64) update rows:
        each update is rank-1 (w27 outer gfeat), so only its 5 scalar
        factors ride the sort, and rows are rebuilt inside each window of
        sorted_window_accumulate_factored right before the one-hot matmul.
    """
    lo, hi = config.active_range
    L, F = hi - lo, config.features_per_level
    Wrow = config.blocked_row_width
    level_rows_full = config.blocked_level_rows()
    total_rows = int(level_rows_full.sum())
    # global row span of the active level window [lo, hi)
    start_rows = int(level_rows_full[:lo].sum())
    end_rows = int(level_rows_full[:hi].sum())
    scalings_np = config.scalings().astype(np.float32)[lo:hi]
    pdt = jnp.bfloat16 if config.gather_dtype == "bfloat16" else jnp.float32

    use_pallas = config.combine_impl == "pallas"
    if config.combine_impl == "auto":
        from lsenerf_tpu.ops import pallas_combine

        use_pallas = pallas_combine.available()

    level_rows_np = level_rows_full[lo:hi]
    fwd_dense_L = (
        int(np.searchsorted(level_rows_np, config.dense_fwd_rows + 1))
        if config.dense_fwd_rows > 0
        else 0
    )

    def gather_rows(gtable, keys):
        """(L, n) keys -> (L, n, Wrow) rows. Small-table levels resolve via
        a fused one-hot matmul (MXU) instead of the latency-bound row
        gather. The (L, n) structure is preserved so the per-sample axis
        keeps its ray sharding under a DP mesh (a flat (L*n,) gather would
        force GSPMD to replicate the keys)."""
        if fwd_dense_L == 0:
            return jnp.take(gtable, keys, axis=0)
        parts = []
        row_off = start_rows
        for lev in range(fwd_dense_L):
            rl = int(level_rows_np[lev])
            onehot = (
                keys[lev][:, None]
                == (jnp.arange(rl, dtype=jnp.int32) + row_off)[None, :]
            ).astype(gtable.dtype)  # fused into the matmul operand
            parts.append(
                jax.lax.dot_general(
                    onehot,
                    gtable[row_off : row_off + rl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(gtable.dtype)  # (n, Wrow)
            )
            row_off += rl
        rest = jnp.take(gtable, keys[fwd_dense_L:], axis=0)  # (L', n, Wrow)
        return jnp.concatenate([jnp.stack(parts, axis=0), rest], axis=0)

    def fwd_core(table, positions):
        n = positions.shape[0]
        keys, (ox, wx), (oy, wy), (oz, wz) = _blocked_keys_fracs(positions, config)
        gtable = table
        if config.gather_dtype == "bfloat16":
            gtable = table.astype(jnp.bfloat16)
        rows = gather_rows(gtable, keys)  # (L, n, Wrow)
        if use_pallas:
            from lsenerf_tpu.ops import pallas_combine

            ex = (ox.astype(jnp.float32) + wx).reshape(-1)
            ey = (oy.astype(jnp.float32) + wy).reshape(-1)
            ez = (oz.astype(jnp.float32) + wz).reshape(-1)
            feats = pallas_combine.combine(
                rows.reshape(L * n, Wrow), ex, ey, ez, F
            )  # (F, m)
            out = feats.reshape(F, L, n).transpose(2, 1, 0).reshape(n, L * F)
        else:
            out = _blocked_combine_struct(rows, ox, wx, oy, wy, oz, wz, config)
        # `table` rides along only for its dtype (param buffer, no copy)
        return out, (keys, rows, ox, wx, oy, wy, oz, wz, table)

    @jax.custom_vjp
    def encode(table, positions):
        return fwd_core(table, positions)[0]

    def fwd(table, positions):
        out, res = fwd_core(table, positions)
        return out, res

    def bwd(res, g):
        keys, rows, ox, wx, oy, wy, oz, wz, table = res
        n = g.shape[0]
        m = L * n
        # cotangent in the level-major update order used by keys. The 3-D
        # (F, L, n) form keeps the SAMPLE axis a real array dim: under a DP
        # mesh the n axis carries the batch's ray sharding, and flattening
        # (L, n) -> (L*n,) merges an unsharded-major with a sharded-minor
        # dim — inexpressible in GSPMD tiling, so every consumer of a flat
        # per-sample array forces an all-gather (measured 64.5 MB/step of
        # [16,55936]-shaped gathers, scripts/psum_accounting.py). All
        # shard_map-bound factors therefore stay (L, n); only the local
        # position-grad math below uses the flat view.
        gfeat3 = g.reshape(n, L, F).transpose(2, 1, 0)  # (F, L, n)
        gfeat = gfeat3.reshape(F, m)  # (F, m) flat view (local math only)

        # ---- position gradients (through the trilinear weights) ----
        # all math stays (.., L, n)-structured — see the gfeat3 note
        scal = jnp.asarray(scalings_np)[:, None]  # (L, 1)
        if use_pallas:
            from lsenerf_tpu.ops import pallas_combine

            ex = (ox.astype(jnp.float32) + wx).reshape(-1)
            ey = (oy.astype(jnp.float32) + wy).reshape(-1)
            ez = (oz.astype(jnp.float32) + wz).reshape(-1)
            dw = pallas_combine.combine_bwd_dw(
                rows.reshape(m, Wrow), gfeat, ex, ey, ez, F
            )
            dpx = (dw[0].reshape(L, n) * scal).sum(axis=0)
            dpy = (dw[1].reshape(L, n) * scal).sum(axis=0)
            dpz = (dw[2].reshape(L, n) * scal).sum(axis=0)
        else:
            rows27 = (
                rows[..., : 27 * F].astype(jnp.float32)
                .reshape(L, n, 27, F)
                .transpose(2, 3, 0, 1)
            )  # (27, F, L, n)
            dw27 = (rows27 * gfeat3[None]).sum(axis=1).reshape(3, 3, 3, L, n)
            ux, uy, uz = (
                _dim_weights(ox, wx),
                _dim_weights(oy, wy),
                _dim_weights(oz, wz),
            )  # (3, L, n)
            dux = (dw27 * uy[None, :, None] * uz[None, None, :]).sum(axis=(1, 2))
            duy = (dw27 * ux[:, None, None] * uz[None, None, :]).sum(axis=(0, 2))
            duz = (dw27 * ux[:, None, None] * uy[None, :, None]).sum(axis=(0, 1))

            def dw_of(du, o):
                of = o.astype(jnp.float32)  # (L, n)
                # du/dw rows over slots {o, o+1}: [-(1-o), (1-2o), o]
                return (
                    -du[0] * (1.0 - of) + du[1] * (1.0 - 2.0 * of) + du[2] * of
                )

            dpx = (dw_of(dux, ox) * scal).sum(axis=0)
            dpy = (dw_of(duy, oy) * scal).sum(axis=0)
            dpz = (dw_of(duz, oz) * scal).sum(axis=0)
        dpos = jnp.stack([dpx, dpy, dpz], axis=1)

        # ---- table gradient: factored sort + in-window row rebuild ----
        # parity rides the sign: e = o ? -(w+1) : w  (w in [0,1], so the
        # o=1 branch is <= -1 and never collides with -0.0)
        def enc(w, o):
            return jnp.where(o.astype(bool), -(w + 1.0), w).astype(pdt)

        # every factor keeps the (L, n) level/sample structure (see gfeat3)
        factors = tuple(gfeat3[f].astype(pdt) for f in range(F)) + (
            enc(wx, ox), enc(wy, oy), enc(wz, oz),
        )

        def make_rows(seg):
            gf = jnp.stack(
                [seg[f].astype(jnp.float32) for f in range(F)], axis=1
            )  # (u, F)

            def dec(e):
                e = e.astype(jnp.float32)
                o = e < 0
                w = jnp.where(o, -e - 1.0, e)
                return o.astype(jnp.float32), w

            ux_, uy_, uz_ = (
                _dim_weights(*dec(seg[F])).T,
                _dim_weights(*dec(seg[F + 1])).T,
                _dim_weights(*dec(seg[F + 2])).T,
            )  # each (u, 3)
            w27 = (
                ux_[:, :, None, None] * uy_[:, None, :, None] * uz_[:, None, None, :]
            ).reshape(-1, 27)
            rows_u = (w27[:, :, None] * gf[:, None, :]).reshape(-1, 27 * F)
            if Wrow > 27 * F:
                rows_u = jnp.pad(rows_u, ((0, 0), (0, Wrow - 27 * F)))
            return rows_u.astype(pdt)

        # Dense-prefix levels: exact one-hot matmul per level (no sort, no
        # per-window cap). blocked_level_rows is nondecreasing, so the
        # qualifying ACTIVE levels are a prefix occupying the window's first
        # `dense_total` rows (global rows [start_rows, start_rows+dense_total)).
        level_rows = level_rows_np
        dense_L = _dense_level_count(config)
        dense_total = int(level_rows[:dense_L].sum())
        fac2 = factors  # already (L, n) per factor

        parts = []
        row_off = start_rows
        for lev in range(dense_L):
            rl = int(level_rows[lev])
            rows_u = make_rows(tuple(f[lev] for f in fac2))  # (n, Wrow)
            onehot = (
                keys[lev][:, None]
                == (jnp.arange(rl, dtype=jnp.int32) + row_off)[None, :]
            ).astype(rows_u.dtype)  # (n, rl)
            parts.append(
                jax.lax.dot_general(
                    onehot, rows_u,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (rl, Wrow)
            )
            row_off += rl

        if dense_L < L:
            # keep the (levels, n) structure: dp_accumulate shards dim=1 (the
            # sample axis, which already carries the batch's ray sharding) so
            # the shard_map consumes the incoming layout instead of forcing a
            # level-chunk reshard (the r4 involuntary-remat pathology); each
            # shard flattens its local block level-major
            keys_h2 = keys[dense_L:] - (start_rows + dense_total)  # (Lh, n)
            factors_h2 = tuple(f[dense_L:] for f in fac2)
            # window/batch_windows tuned on-chip (scripts/tune_accumulate.py):
            # 512/16 measured 52.9 ms vs 72.0 ms at 128/8 (the lax.map
            # iteration count dominates, not the per-window matmul);
            # batch_windows=32 then measured another bench-level win
            # (48.7k vs 47.1k rays/s, commit a94fcc0)
            # max_updates_factor=3 is safe once the dense prefix is removed:
            # remaining (hashed/uniform) levels have near-Poisson density per
            # key, so a 3x-mean window cap needs a >3x hot spot to overflow
            # under an ambient DP mesh the accumulate runs shard_map'd
            # (each device sorts its slice of the update stream, one psum of
            # the table partials). The slice is along the SAMPLE axis of the
            # (levels, n) factors, so per-level segment boundaries survive
            # sharding and the segmented-sort variant composes with dp.
            dp_axis = config.dp_axis or None
            presorted = L - dense_L if config.segmented_sort else 1

            def acc_hashed(k2, *f2):
                return sorted_window_accumulate_factored(
                    k2.reshape(-1), tuple(f.reshape(-1) for f in f2),
                    make_rows, Wrow,
                    end_rows - start_rows - dense_total,
                    out_dtype=jnp.float32,
                    window=config.accum_window,
                    batch_windows=config.accum_batch_windows,
                    max_updates_factor=3,
                    # the flattened keys are level-major with increasing
                    # per-level row offsets: per-level batched sorts
                    # concatenated == the global sort, at less bitonic depth
                    presorted_segments=presorted,
                )

            parts.append(
                fast_gather.dp_accumulate(
                    acc_hashed, keys_h2, *factors_h2, axis=dp_axis, dim=1
                )
            )
        # inactive levels outside the window contribute zero table gradient
        if start_rows:
            parts.insert(0, jnp.zeros((start_rows, Wrow), jnp.float32))
        if end_rows < total_rows:
            parts.append(jnp.zeros((total_rows - end_rows, Wrow), jnp.float32))
        dtab = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return dtab.astype(table.dtype), dpos

    encode.defvjp(fwd, bwd)
    return encode


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

    Differentiable in the table and in positions (through the trilinear
    weights), exactly like the ngp layout. Two table-gradient paths
    (config.blocked_backward): "factored" (default, custom VJP — sorts the
    5 scalar factors of each rank-1 row update instead of permuting
    materialized rows) and "autodiff" (materialized-row oracle via
    take_rows_blocked's sorted-window backward).
    """
    if config.blocked_backward == "factored":
        return _blocked_fast_fn(config)(table, positions)

    n = positions.shape[0]
    keys, (ox, wx), (oy, wy), (oz, wz) = _blocked_keys_fracs(positions, config)
    if config.gather_dtype == "bfloat16":
        table = table.astype(jnp.bfloat16)
    rows = take_rows_blocked(table, keys.reshape(-1))  # (L*n, Wrow)
    return _blocked_combine(rows, ox, wx, oy, wy, oz, wz, n, config)


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
    lo, hi = config.active_range
    L, F, T = hi - lo, config.features_per_level, config.table_size
    scalings = jnp.asarray(config.scalings()[lo:hi], dtype=jnp.float32)  # (L,)

    # sample-minor coordinate arrays: (L, n) per dimension
    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    sx = px[None, :] * scalings[:, None]
    sy = py[None, :] * scalings[:, None]
    sz = pz[None, :] * scalings[:, None]
    fx_, fy_, fz_ = jnp.floor(sx), jnp.floor(sy), jnp.floor(sz)
    wx, wy, wz = sx - fx_, sy - fy_, sz - fz_  # trilinear fracs (L, n)
    bx, by, bz = fx_.astype(jnp.int32), fy_.astype(jnp.int32), fz_.astype(jnp.int32)

    level_offset = (jnp.arange(L, dtype=jnp.int32)[:, None] + lo) * T  # (L, 1)

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
