"""Static-shape occupancy-skipping ray marching.

The TPU-native replacement for nerfacc's `traverse_grids` +
`render_visibility_*` (reference lse_grid_estimator.py:93-143): instead of
variable-length packed samples, each ray gets a fixed budget of
`max_samples` intervals selected from up to `max_candidates` candidate march
steps by occupancy-grid lookup, with everything expressed as dense
(n_rays, k) arrays + a validity mask. XLA sees only static shapes; skipped
space costs one grid lookup instead of a field evaluation.

Key tricks:
  - the cone-angle step recurrence t_{i+1} = t_i + max(step, cone*t_i) has a
    closed form (linear phase then geometric phase), so candidate t's at ANY
    index are one vectorized expression — no sequential march loop at all;
  - hierarchical (two-phase) testing: TPU occupancy gathers are
    latency-bound per row, so instead of testing all max_candidates
    midpoints, phase 1 tests coarse SEGMENTS of `coarse_factor` candidates
    (at their shared endpoints; optionally also midpoints) against a
    conservative OR-downsampled supergrid (occupancy.build_super_binaries)
    and stride-compacts occupied segments into `max_coarse_segments` slots;
    phase 2 tests only the fine candidates inside selected segments — ~3x
    fewer gather rows, exact vs the flat scan whenever occupied segments
    fit the budgets;
  - compaction of occupied candidates into the per-ray sample budget is a
    batched one-hot MXU matmul (TPU scatters cost ~90 ns/index).

Gradient contract (mirrors the reference's un-no_grad'ed sampling,
lse_grid_estimator.py:13-14): t-values are stop_gradient'ed, but sample
positions are rebuilt from the differentiable ray origins/directions, so pose
gradients flow through the field inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lsenerf_tpu.cameras.rays import RayBundle, RaySamples
from lsenerf_tpu.ops import occupancy as occ_lib


@dataclass(frozen=True)
class MarchConfig:
    render_step_size: float  # auto: scene diag / 1000 (lsenerf.py:180-182)
    near_plane: float = 0.05  # NGP defaults inherited by the reference config
    far_plane: float = 1e3
    cone_angle: float = 0.004
    alpha_thre: float = 0.01
    early_stop_eps: float = 1e-4
    max_samples: int = 48  # per-ray sample budget (dense layout)
    max_candidates: int = 512  # candidate march steps scanned for occupancy
    # Hierarchical (two-phase) candidate testing: phase 1 tests
    # max_candidates/coarse_factor SEGMENT midpoints against a conservative
    # OR-downsampled supergrid and stride-compacts occupied segments into
    # max_coarse_segments slots; phase 2 tests only the fine candidates
    # inside selected segments. Cuts occupancy-gather rows ~2.7x (the TPU
    # gather is latency-bound per row). Exact vs the flat scan whenever
    # occupied segments fit the budget (converged grids); under budget
    # pressure it falls back to the same stratified-stride quadrature the
    # flat path uses.
    hierarchical: bool = True
    coarse_factor: int = 8
    max_coarse_segments: int = 24
    # Also test each segment's midpoint (3 points/segment instead of the 2
    # shared endpoints). Midpoints halve the corner-crossing miss window at
    # +50% phase-1 lookups. Off by default: segments span <=0.26 supercells,
    # so an endpoint-only miss needs a supercell corner clip shorter than
    # the segment strictly between its endpoints — and any such miss only
    # perturbs the (heuristic, stop-gradient) sample placement.
    test_segment_midpoints: bool = False
    # Resolve phase-1 supergrid lookups with a one-hot MXU matmul instead of
    # a row gather (occupancy._grid_lookup_matmul; exact). Only applies when
    # the supergrid fits the small-table bound (levels * S^3 <= 64k cells).
    # Measured +4.5% step throughput at flagship scale (scripts/ab_bench.py:
    # 53.6k -> 56.0k rays/s): ~230k latency-bound gather rows move onto the
    # otherwise-idle MXU.
    supergrid_matmul: bool = True
    # Resolve phase-2 fine lookups from bit-packed per-supercell rows
    # (occupancy.build_packed_blocks): ~2 row gathers per SEGMENT instead of
    # `coarse_factor` per-midpoint gathers, plus VPU bit extraction. The two
    # rows cover the supercells of the segment's first and last midpoint;
    # the rare midpoint in a third supercell (a multi-axis corner crossing
    # strictly inside one sub-supercell-length segment) is treated as
    # occupied — conservative: it can only ADD a candidate in possibly-empty
    # space (wasting a sample slot), never drop occupied geometry.
    packed_phase2: bool = True
    # Proposal-guided sample relocation: after occupancy compaction fills the
    # max_samples candidate slots, RESAMPLE them down to `proposal_samples`
    # fine samples placed by inverse-CDF over a density proposal read from
    # the occupancy grid's EMA values (the same sigma*step estimate nerfacc
    # thresholds on). Field evaluations per ray drop from max_samples to
    # proposal_samples — the per-ray hash-gather row count, which bounds the
    # whole step on TPU (PERFORMANCE.md), scales with it. The quadrature
    # stays consistent: each fine sample carries pdf-mass 1/F, so its
    # interval width is (1/F)/pdf-density — bin widths sum to the occupied
    # span in expectation (exactly, for a uniform proposal). Rays with fewer
    # occupied candidates than F get SUB-candidate resolution (the budget
    # subdivides the surface interval) — finer near-surface quadrature than
    # the uniform placement it replaces. 0 disables (uniform placement).
    proposal_samples: int = 0
    # Fraction of proposal mass spread uniformly over all occupied candidates
    # (defense against a stale/overconfident EMA: every occupied region keeps
    # expected coverage >= uniform_frac * F / count samples).
    proposal_uniform_frac: float = 0.2


def ray_aabb_intersect(
    origins: jnp.ndarray, directions: jnp.ndarray, aabb_half: float
) -> tuple:
    """Slab test against the cube [-h, h]^3. Returns (t_min, t_max), t_min>t_max
    when the ray misses."""
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    t0 = (-aabb_half - origins) * inv
    t1 = (aabb_half - origins) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_near, t_far


def ts_at_indices(
    t_min: jnp.ndarray, i: jnp.ndarray, config: MarchConfig
) -> jnp.ndarray:
    """Boundary t of candidate index i (closed form of the step recurrence).

    t_min: (n,) per-ray start distance; i: (n, ...) or (1, ...) float32
    indices. Implements t_{i+1} = t_i + max(step, cone*t_i):
      - while t < step/cone: arithmetic with stride `step`
      - after:               geometric with ratio (1 + cone)
    """
    step = config.render_step_size
    cone = config.cone_angle
    t_min = t_min.reshape(t_min.shape + (1,) * (i.ndim - 1))

    if cone <= 0.0:
        return t_min + i * step

    t_crit = step / cone  # boundary between phases
    n_lin = jnp.ceil(jnp.maximum(t_crit - t_min, 0.0) / step)
    t_lin = t_min + jnp.minimum(i, n_lin) * step
    t_geo_start = t_min + n_lin * step
    geo_steps = jnp.maximum(i - n_lin, 0.0)
    return jnp.where(
        i <= n_lin, t_lin, t_geo_start * (1.0 + cone) ** geo_steps
    )


def candidate_ts(t_min: jnp.ndarray, config: MarchConfig) -> jnp.ndarray:
    """(n,) start distances -> (n, max_candidates+1) interval boundaries."""
    m = config.max_candidates + 1
    i = jnp.arange(m, dtype=jnp.float32)[None, :]  # (1, m)
    return ts_at_indices(t_min, i, config)


def packed_segment_lookup(
    binaries: jnp.ndarray,
    o_ng: jnp.ndarray,
    d_ng: jnp.ndarray,
    mids: jnp.ndarray,
    occ_config: occ_lib.OccGridConfig,
) -> jnp.ndarray:
    """Phase-2 occupancy of segment midpoints via bit-packed supercell rows.

    mids: (n, k1, cf) per-segment fine-candidate midpoints (distances along
    the ray). Returns (n, k1*cf) bool. Gathers ~2 packed rows per SEGMENT
    (supercells of the first and last midpoint) instead of cf per-midpoint
    rows — TPU gathers are latency-bound per row. Contract vs the plain
    per-midpoint `_grid_lookup`: identical for every midpoint whose
    supercell matches either gathered row; a midpoint in a THIRD supercell
    (multi-axis corner crossing inside one sub-supercell segment) reads
    conservatively occupied — it can only add a candidate in possibly-empty
    space, never drop occupied geometry (tests/test_march_composite.py
    asserts the no-drop direction exactly).
    """
    n, k1, cf = mids.shape
    R = binaries.shape[-1]
    S = R // cf
    packed = occ_lib.build_packed_blocks(binaries, cf)
    flat = mids.reshape(n, k1 * cf)
    lvl, ix, iy, iz = occ_lib._cell_coords(
        o_ng[:, None, 0] + flat * d_ng[:, None, 0],
        o_ng[:, None, 1] + flat * d_ng[:, None, 1],
        o_ng[:, None, 2] + flat * d_ng[:, None, 2],
        R,
        occ_config,
    )
    sup = ((lvl * S + ix // cf) * S + iy // cf) * S + iz // cf
    loc = ((ix % cf) * cf + iy % cf) * cf + iz % cf
    sup3 = sup.reshape(n, k1, cf)
    loc3 = loc.reshape(n, k1, cf)
    rows0 = jnp.take(packed, sup3[..., 0], axis=0)  # (n, k1, nw)
    rows1 = jnp.take(packed, sup3[..., -1], axis=0)
    nw = cf**3 // 32
    sel_w = (
        (loc3 >> 5)[..., None]
        == jnp.arange(nw, dtype=jnp.int32)[None, None, None, :]
    )  # (n, k1, cf, nw)

    def pick_bit(rows):
        word = jnp.sum(
            jnp.where(sel_w, rows[:, :, None, :], jnp.uint32(0)),
            axis=-1,
            dtype=jnp.uint32,
        )  # (n, k1, cf)
        return ((word >> (loc3 & 31).astype(jnp.uint32)) & 1) > 0

    occ_m = jnp.where(
        sup3 == sup3[..., :1],
        pick_bit(rows0),
        jnp.where(sup3 == sup3[..., -1:], pick_bit(rows1), True),
    )
    return occ_m.reshape(n, k1 * cf)


def proposal_resample(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    mask: jnp.ndarray,
    occ_state: occ_lib.OccGridState,
    o_ng: jnp.ndarray,
    d_ng: jnp.ndarray,
    config: MarchConfig,
    occ_config: occ_lib.OccGridConfig,
) -> tuple:
    """Inverse-CDF relocation of the sample budget by the occ-EMA proposal.

    (n, k) candidate intervals -> (n, F) fine intervals, F =
    config.proposal_samples. The proposal density for candidate i is the
    alpha implied by the grid's EMA value at its midpoint (EMA stores
    max-decayed sigma*render_step, nerfacc units — occupancy.sampled_update),
    blended with `proposal_uniform_frac` of uniform mass over all valid
    candidates. Fine sample j sits at the t where the CDF crosses
    (j+0.5)/F and carries interval width dt_bin/(F*pdf_bin) — the mass-1/F
    quadrature rule, so per-bin widths total the bin width in expectation
    (exactly for a uniform proposal). Entirely non-differentiable, like the
    rest of the sample-placement pipeline (stop_gradient contract in
    march_rays).

    Replaces nothing in the reference (nerfacc evaluates EVERY occupied
    candidate as a packed list); this is the TPU answer to the same budget
    problem: the hash-table gather rows per ray — the measured step
    bottleneck — scale with samples/ray, so relocating a smaller budget by
    the grid's own density estimate buys throughput at matched quadrature.
    """
    n, k = t_starts.shape
    F = config.proposal_samples
    dt = t_ends - t_starts
    mids = 0.5 * (t_starts + t_ends)
    ema = occ_lib.ema_at_coords(
        occ_state.occs,
        o_ng[:, None, 0] + mids * d_ng[:, None, 0],
        o_ng[:, None, 1] + mids * d_ng[:, None, 1],
        o_ng[:, None, 2] + mids * d_ng[:, None, 2],
        occ_config,
    )  # (n, k)
    # alpha implied by the EMA density over this (stride-widened) interval.
    # NOT transmittance-weighted: the optimistic EMA init would otherwise
    # concentrate every sample at the front of the ray before the field has
    # learned anything (EMA=1 != field density early in training); plain
    # occupancy mass degrades gracefully to uniform there.
    tau = ema * dt / config.render_step_size
    alpha = 1.0 - jnp.exp(-tau)
    w = jnp.where(mask, alpha, 0.0)
    count = jnp.sum(mask, axis=1, keepdims=True)
    valid = count > 0
    uni = jnp.where(mask, 1.0, 0.0) / jnp.maximum(count, 1).astype(t_starts.dtype)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    lam = config.proposal_uniform_frac
    pdf = jnp.where(
        wsum > 1e-12,
        (1.0 - lam) * w / jnp.maximum(wsum, 1e-12) + lam * uni,
        uni,
    )
    cdf = jnp.cumsum(pdf, axis=1)  # (n, k), ~1 at the last valid candidate
    u = (jnp.arange(F, dtype=t_starts.dtype) + 0.5) / F  # (F,)
    # stratified inverse CDF: bin index where the CDF first exceeds u
    idx = jnp.sum(
        (u[None, :, None] > cdf[:, None, :]).astype(jnp.int32), axis=-1
    )  # (n, F), nondecreasing in j
    idx = jnp.minimum(idx, k - 1)

    def take(a):
        return jnp.take_along_axis(a, idx, axis=1)

    t0_s, dt_s, pdf_s = take(t_starts), take(dt), take(pdf)
    cdf_prev = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], axis=1)
    frac = jnp.clip(
        (u[None, :] - take(cdf_prev)) / jnp.maximum(pdf_s, 1e-12), 0.0, 1.0
    )
    t_c = t0_s + frac * dt_s
    dt_f = dt_s / jnp.maximum(pdf_s * F, 1e-12)
    mask_f = jnp.broadcast_to(valid, (n, F))
    dt_f = jnp.where(mask_f, dt_f, 0.0)
    return t_c - 0.5 * dt_f, t_c + 0.5 * dt_f, mask_f


def march_rays(
    bundle: RayBundle,
    occ_state: occ_lib.OccGridState,
    occ_config: occ_lib.OccGridConfig,
    config: MarchConfig,
) -> RaySamples:
    """Generate dense masked samples along each ray, skipping empty space.

    Replaces VolumetricSampler/LSEOccGridEstimator.sampling
    (lsenerf.py:283-290, lse_grid_estimator.py:14-144).
    """
    n = len(bundle)
    k = config.max_samples

    origins = bundle.origins
    directions = bundle.directions

    # the whole selection pipeline is non-differentiable by design
    o_ng = jax.lax.stop_gradient(origins)
    d_ng = jax.lax.stop_gradient(directions)

    outer_half = occ_config.aabb_scale * (2.0 ** (occ_config.levels - 1))
    t_enter, t_exit = ray_aabb_intersect(o_ng, d_ng, outer_half)
    t_lo = jnp.maximum(jnp.maximum(t_enter, config.near_plane), 0.0)
    t_hi = jnp.minimum(t_exit, config.far_plane)
    if bundle.nears is not None:
        t_lo = jnp.maximum(t_lo, bundle.nears[:, 0])
    if bundle.fars is not None:
        t_hi = jnp.minimum(t_hi, bundle.fars[:, 0])

    def lookup(binaries, mids):
        # occupancy lookup at interval midpoints; coordinates stay as
        # separate (n, m) planes (sample-minor TPU layout — see _grid_lookup)
        return occ_lib._grid_lookup(
            binaries,
            o_ng[:, None, 0] + mids * d_ng[:, None, 0],
            o_ng[:, None, 1] + mids * d_ng[:, None, 1],
            o_ng[:, None, 2] + mids * d_ng[:, None, 2],
            occ_config,
        )

    cf = config.coarse_factor
    use_hier = (
        config.hierarchical
        and config.max_candidates % cf == 0
        and occ_config.resolution % cf == 0
        # multi-level grids additionally need the supergrid side divisible
        # by 4 for build_super_binaries' adjacent-level merge (its
        # conservativeness depends on the merge, so fall back to the flat
        # path rather than march against an un-merged supergrid)
        and (
            occ_config.levels == 1
            or (occ_config.resolution // cf) % 4 == 0
        )
        and config.max_candidates // cf > config.max_coarse_segments
    )
    if use_hier:
        mc = config.max_candidates // cf
        k1 = config.max_coarse_segments
        # --- phase 1: segments vs the conservative supergrid, tested at
        # midpoint AND both endpoints (boundary lookups are shared between
        # adjacent segments): a sub-supercell segment's fine midpoints all
        # lie in a supercell one of the three test points hits, except
        # corner crossings between adjacent test points (accepted — see
        # build_super_binaries)
        jc = jnp.arange(mc + 1, dtype=jnp.float32)[None, :] * cf
        tc = ts_at_indices(t_lo, jc, config)  # (n, mc+1)
        super_bin = occ_lib.build_super_binaries(
            occ_state.binaries, cf, occ_config
        )

        if config.supergrid_matmul and super_bin.size <= 65536:
            def lookup_super(binaries, mids):
                return occ_lib._grid_lookup_matmul(
                    binaries,
                    o_ng[:, None, 0] + mids * d_ng[:, None, 0],
                    o_ng[:, None, 1] + mids * d_ng[:, None, 1],
                    o_ng[:, None, 2] + mids * d_ng[:, None, 2],
                    occ_config,
                )
        else:
            lookup_super = lookup

        occ_b = lookup_super(super_bin, tc)  # (n, mc+1) boundary points
        keep_c = occ_b[:, :-1] | occ_b[:, 1:]
        if config.test_segment_midpoints:
            mids_c = 0.5 * (tc[:, :-1] + tc[:, 1:])
            keep_c = keep_c | lookup_super(super_bin, mids_c)
        keep_c = keep_c & (tc[:, :-1] < t_hi[:, None])

        slot_c = jnp.cumsum(keep_c, axis=1) - 1
        count_c = jnp.sum(keep_c, axis=1)  # (n,)
        stride_c = jnp.maximum((count_c + k1 - 1) // k1, 1)[:, None]
        sel_c = keep_c & (slot_c % stride_c == 0)
        out_slot_c = slot_c // stride_c
        # compact the SEGMENT INDEX via a one-hot matmul (f32 is exact for
        # indices < 2^24); empty slots produce 0 and are masked below
        onehot_c = jnp.where(
            sel_c[:, None, :],
            (
                out_slot_c[:, None, :]
                == jnp.arange(k1, dtype=out_slot_c.dtype)[None, :, None]
            ).astype(jnp.float32),
            jnp.zeros((), jnp.float32),
        )  # (n, k1, mc)
        segidx = jnp.einsum(
            "nkm,m->nk", onehot_c, jnp.arange(mc, dtype=jnp.float32)
        )  # (n, k1)
        nseg = jnp.sum(sel_c, axis=1)  # (n,)
        slot_ok = jnp.arange(k1)[None, :] < nseg[:, None]  # (n, k1)

        # --- phase 2: fine candidates inside the selected segments
        fine_i = (
            segidx[:, :, None] * cf
            + jnp.arange(cf, dtype=jnp.float32)[None, None, :]
        ).reshape(n, k1 * cf)
        t0s = ts_at_indices(t_lo, fine_i, config)
        t1s = ts_at_indices(t_lo, fine_i + 1.0, config)
        # a coarse-stride drop widens every fine dt by the coarse stride
        # (same stratified-quadrature contract as the flat path)
        dts_base = (t1s - t0s) * stride_c.astype(t1s.dtype)
        mids = 0.5 * (t0s + t1s)
        in_range = (
            (mids < t_hi[:, None])
            & jnp.repeat(slot_ok, cf, axis=1)
        )
        if config.packed_phase2 and cf**3 % 32 == 0:
            keep = (
                packed_segment_lookup(
                    occ_state.binaries, o_ng, d_ng,
                    mids.reshape(n, k1, cf), occ_config,
                )
                & in_range
            )
        else:
            keep = lookup(occ_state.binaries, mids) & in_range  # (n, k1*cf)
    else:
        ts = candidate_ts(t_lo, config)  # (n, m+1)
        t0s, t1s = ts[:, :-1], ts[:, 1:]
        dts_base = t1s - t0s
        mids = 0.5 * (t0s + t1s)
        in_range = mids < t_hi[:, None]
        keep = lookup(occ_state.binaries, mids) & in_range  # (n, m)

    # Compact kept candidates into the per-ray budget. When more than k
    # candidates survive the occupancy test (e.g. a fresh fully-dense grid),
    # taking the FIRST k would confine samples to a thin shell near the
    # camera and training could never see the scene (the occupancy grid then
    # never decays — a startup deadlock the reference avoids by evaluating
    # ALL survivors as a variable-length packed list). Instead select every
    # stride-th survivor (stride = ceil(count / k)) and widen each selected
    # interval's dt by the stride: a stratified quadrature of the same
    # transmittance integral that spans the full occupied range. Once the
    # grid converges (count <= k) stride == 1 and this is exact.
    slot = jnp.cumsum(keep, axis=1) - 1  # (n, m) rank among kept candidates
    count_all = jnp.sum(keep, axis=1)  # (n,)
    stride = jnp.maximum((count_all + k - 1) // k, 1)[:, None]  # (n, 1)
    sel = keep & (slot % stride == 0)
    out_slot = slot // stride  # < k by construction
    dts = dts_base * stride.astype(t1s.dtype)  # stride-widened quadrature

    # Compact selected candidates into their slots WITHOUT a scatter (TPU
    # scatters cost ~90 ns/index; this was ~1/3 of the whole march): each
    # (ray, slot) output is a one-hot-weighted sum over that ray's
    # candidates, i.e. one small batched matmul on the MXU. out_slot is
    # unique per (ray, slot) among sel, so the sum IS the selection. f32
    # matmul keeps t-values exact (they are sums of step multiples well
    # within f32's 24-bit mantissa).
    onehot = jnp.where(
        sel[:, None, :],
        (out_slot[:, None, :] == jnp.arange(k, dtype=out_slot.dtype)[None, :, None])
        .astype(t0s.dtype),
        jnp.zeros((), t0s.dtype),
    )  # (n, k, m)
    vals = jnp.stack([t0s, t0s + dts], axis=-1)  # (n, m, 2)
    picked = jax.lax.dot_general(
        onehot, vals,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n, k, 2)
    t_starts, t_ends = picked[..., 0], picked[..., 1]
    count = jnp.sum(sel, axis=1)  # (n,)
    mask = jnp.arange(k)[None, :] < count[:, None]

    if 0 < config.proposal_samples < k:
        t_starts, t_ends, mask = proposal_resample(
            t_starts, t_ends, mask, occ_state, o_ng, d_ng, config, occ_config
        )

    # rebuild positions from the DIFFERENTIABLE origins/directions
    t_mid = jax.lax.stop_gradient(0.5 * (t_starts + t_ends))
    positions = origins[:, None, :] + t_mid[..., None] * directions[:, None, :]
    dirs = jnp.broadcast_to(directions[:, None, :], positions.shape)

    return RaySamples(
        positions=positions,
        directions=dirs,
        t_starts=jax.lax.stop_gradient(t_starts),
        t_ends=jax.lax.stop_gradient(t_ends),
        mask=mask,
    )
