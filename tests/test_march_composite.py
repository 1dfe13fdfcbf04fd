"""Tests for occupancy grid, static-shape ray marching, and compositing."""

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.cameras.rays import RayBundle, RaySamples
from lsenerf_tpu.ops import composite, march
from lsenerf_tpu.ops import occupancy as occ_lib


def make_bundle(origins, directions):
    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    n = origins.shape[0]
    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )


SMALL_GRID = occ_lib.OccGridConfig(resolution=16, levels=2, aabb_scale=1.0)
MARCH = march.MarchConfig(
    render_step_size=0.02, near_plane=0.05, far_plane=100.0, cone_angle=0.004,
    max_samples=32, max_candidates=256,
)


def test_ray_aabb_intersect():
    t0, t1 = march.ray_aabb_intersect(
        jnp.array([[-3.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]), 1.0
    )
    np.testing.assert_allclose(float(t0[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(t1[0]), 4.0, atol=1e-5)
    # miss
    t0, t1 = march.ray_aabb_intersect(
        jnp.array([[-3.0, 5.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]), 1.0
    )
    assert float(t0[0]) > float(t1[0])


def test_candidate_ts_matches_recurrence():
    cfg = MARCH
    t_min = jnp.array([0.05, 1.7, 30.0])
    got = np.asarray(march.candidate_ts(t_min, cfg))
    for r, t0 in enumerate(np.asarray(t_min)):
        t = float(t0)
        for i in range(cfg.max_candidates + 1):
            np.testing.assert_allclose(got[r, i], t, rtol=2e-4)
            t = t + max(cfg.render_step_size, cfg.cone_angle * t)


def test_candidate_ts_zero_cone_uniform():
    cfg = march.MarchConfig(render_step_size=0.1, cone_angle=0.0, max_candidates=16)
    got = np.asarray(march.candidate_ts(jnp.array([1.0]), cfg))[0]
    np.testing.assert_allclose(got, 1.0 + 0.1 * np.arange(17), atol=1e-5)


def test_march_full_grid_spans_range_from_entry():
    """A fresh fully-dense grid has more survivors than the budget: the
    stride selection must spread samples across the WHOLE occupied range
    (first-k would confine them near the camera — the startup deadlock),
    with dt widened by the stride so the transmittance quadrature still
    covers the skipped space."""
    state = occ_lib.init_occ_grid(SMALL_GRID)  # fully occupied
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    s = march.march_rays(bundle, state, SMALL_GRID, MARCH)
    m = np.asarray(s.mask[0])
    # ceil(count/stride) samples land in (k/2, k]
    assert MARCH.max_samples // 2 < m.sum() <= MARCH.max_samples
    t0 = np.asarray(s.t_starts[0])
    t1 = np.asarray(s.t_ends[0])
    # starts at the outer aabb entry (t=1 for 2-level grid)
    assert abs(t0[0] - 1.0) < 0.05
    # ...and reaches most of the range to the exit/far limit
    outer_half = SMALL_GRID.aabb_scale * 2.0 ** (SMALL_GRID.levels - 1)
    t_exit = outer_half + 3.0  # ray from x=-3 exits at x=+outer_half
    t_hi = min(t_exit, MARCH.far_plane)
    assert t1[m.sum() - 1] > 0.8 * t_hi
    # strided quadrature: union of widened intervals ~ the full span
    covered = (t1 - t0)[: m.sum()].sum()
    span = t1[m.sum() - 1] - t0[0]
    assert covered > 0.7 * span
    # monotone, non-overlapping starts
    assert (np.diff(t0[: m.sum()]) > 0).all()


def test_march_under_budget_is_exact_contiguous():
    """When survivors fit the budget (converged grid), stride == 1 and the
    intervals are exactly the contiguous candidate intervals."""
    state = occ_lib.init_occ_grid(SMALL_GRID)
    cfg = march.MarchConfig(
        render_step_size=MARCH.render_step_size,
        cone_angle=MARCH.cone_angle,
        max_samples=MARCH.max_samples,
        max_candidates=MARCH.max_candidates,
        far_plane=1.0 + MARCH.max_samples * MARCH.render_step_size * 0.5,
    )
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    s = march.march_rays(bundle, state, SMALL_GRID, cfg)
    m = np.asarray(s.mask[0])
    assert 0 < m.sum() < MARCH.max_samples
    t0 = np.asarray(s.t_starts[0])
    np.testing.assert_allclose(
        t0[1 : m.sum()], np.asarray(s.t_ends[0])[: m.sum() - 1], atol=1e-5
    )


def test_march_skips_empty_space():
    # occupy only cells near the +x boundary shell of level 0
    state = occ_lib.init_occ_grid(SMALL_GRID)
    occs = np.zeros(np.asarray(state.occs).shape, np.float32)
    binaries = np.zeros_like(occs, bool)
    binaries[0, 12:, :, :] = True  # x in [0.5, 1.0] at level 0
    state = occ_lib.OccGridState(occs=jnp.asarray(occs), binaries=jnp.asarray(binaries))

    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    s = march.march_rays(bundle, state, SMALL_GRID, MARCH)
    m = np.asarray(s.mask[0])
    assert m.sum() > 0
    mids = 0.5 * (np.asarray(s.t_starts[0]) + np.asarray(s.t_ends[0]))
    xs = -3.0 + mids[m.astype(bool)]
    # all kept samples lie in the occupied slab (level-0 region [-1,1]: x>=0.5)
    assert (xs >= 0.45).all() and (xs <= 1.05).all()


def test_march_position_gradients_flow_to_origins():
    state = occ_lib.init_occ_grid(SMALL_GRID)
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])

    def f(origins):
        b = bundle.replace(origins=origins)
        s = march.march_rays(b, state, SMALL_GRID, MARCH)
        return jnp.sum(s.positions * s.mask[..., None])

    g = jax.grad(f)(bundle.origins)
    assert float(jnp.abs(g).max()) > 0  # positions differentiable w.r.t. origins


MARCH_PROP = march.MarchConfig(
    render_step_size=0.02, near_plane=0.05, far_plane=100.0, cone_angle=0.004,
    max_samples=32, max_candidates=256, proposal_samples=12,
)


def test_proposal_uniform_ema_preserves_quadrature():
    """With a UNIFORM EMA the proposal pdf is uniform over the valid
    candidates, and the mass-1/F interval rule makes the fine dts sum
    EXACTLY to the candidate span (each fine dt = dt * count / F)."""
    state = occ_lib.init_occ_grid(SMALL_GRID)
    state = occ_lib.OccGridState(
        occs=jnp.full_like(state.occs, 0.5), binaries=jnp.ones_like(state.binaries)
    )
    bundle = make_bundle(
        [[-3.0, 0.0, 0.0], [-3.0, 0.2, 0.1]], [[1.0, 0.0, 0.0], [1.0, 0.05, 0.0]]
    )
    base = march.march_rays(bundle, state, SMALL_GRID, MARCH)
    prop = march.march_rays(bundle, state, SMALL_GRID, MARCH_PROP)
    assert prop.mask.shape == (2, 12)
    assert bool(prop.mask.all())
    span_base = np.asarray(
        jnp.sum(jnp.where(base.mask, base.t_ends - base.t_starts, 0.0), axis=1)
    )
    span_prop = np.asarray(jnp.sum(prop.t_ends - prop.t_starts, axis=1))
    np.testing.assert_allclose(span_prop, span_base, rtol=1e-5)
    # fine midpoints are sorted along the ray
    mids = np.asarray(0.5 * (prop.t_starts + prop.t_ends))
    assert (np.diff(mids, axis=1) >= -1e-6).all()
    # and all lie within the candidate span
    t0 = np.asarray(base.t_starts)[np.asarray(base.mask, bool)].min()
    t1 = np.asarray(base.t_ends)[np.asarray(base.mask, bool)].max()
    assert (mids >= t0 - 1e-5).all() and (mids <= t1 + 1e-5).all()


def test_proposal_concentrates_at_high_ema():
    """A high-EMA slab inside an otherwise low-EMA occupied span should
    attract the non-uniform share of the samples."""
    R = SMALL_GRID.resolution
    occs = jnp.full((SMALL_GRID.levels, R, R, R), 1e-3)
    # level-0 grid covers [-1,1]^3: mark x in [0.25, 0.5) hot (cells 10..11)
    occs = occs.at[0, 10:12, :, :].set(10.0)
    state = occ_lib.OccGridState(occs=occs, binaries=occs > 0)  # all occupied
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    cfg = march.MarchConfig(
        render_step_size=0.02, near_plane=0.05, far_plane=100.0,
        cone_angle=0.0, max_samples=32, max_candidates=256,
        proposal_samples=16, proposal_uniform_frac=0.2,
    )
    s = march.march_rays(bundle, state, SMALL_GRID, cfg)
    mids = np.asarray(0.5 * (s.t_starts + s.t_ends))[0]
    xs = -3.0 + mids
    in_slab = ((xs >= 0.25) & (xs < 0.5)).sum()
    # the slab is a small fraction of the occupied span but the hot EMA
    # should pull well over half the samples into it
    assert in_slab >= 8, (in_slab, xs)


def test_proposal_empty_ray_masked():
    state = occ_lib.init_occ_grid(SMALL_GRID)
    state = occ_lib.OccGridState(
        occs=jnp.zeros_like(state.occs), binaries=jnp.zeros_like(state.binaries)
    )
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    s = march.march_rays(bundle, state, SMALL_GRID, MARCH_PROP)
    assert not bool(s.mask.any())
    assert bool(jnp.isfinite(s.t_starts).all() & jnp.isfinite(s.t_ends).all())


def test_proposal_subdivides_single_candidate():
    """A ray with ONE occupied candidate gets the full fine budget spread
    inside that interval (sub-candidate-resolution quadrature)."""
    R = SMALL_GRID.resolution
    occs = jnp.zeros((SMALL_GRID.levels, R, R, R))
    occs = occs.at[0, 12, 8, 8].set(1.0)  # one fine cell at x~0.5-0.625
    state = occ_lib.OccGridState(occs=occs, binaries=occs > 0)
    bundle = make_bundle([[-3.0, 0.0625, 0.0625]], [[1.0, 0.0, 0.0]])
    cfg = march.MarchConfig(
        render_step_size=0.02, near_plane=0.05, far_plane=100.0,
        cone_angle=0.0, max_samples=32, max_candidates=256,
        proposal_samples=8, hierarchical=False,
    )
    base_cfg = march.MarchConfig(
        render_step_size=0.02, near_plane=0.05, far_plane=100.0,
        cone_angle=0.0, max_samples=32, max_candidates=256,
        hierarchical=False,
    )
    base = march.march_rays(bundle, state, SMALL_GRID, base_cfg)
    n_cand = int(np.asarray(base.mask).sum())
    s = march.march_rays(bundle, state, SMALL_GRID, cfg)
    assert bool(s.mask.all())
    mids = np.asarray(0.5 * (s.t_starts + s.t_ends))[0]
    # all 8 fine samples inside the candidate span, strictly increasing
    tb = np.asarray(base.t_starts)[np.asarray(base.mask, bool)]
    te = np.asarray(base.t_ends)[np.asarray(base.mask, bool)]
    assert (mids >= tb.min() - 1e-5).all() and (mids <= te.max() + 1e-5).all()
    if n_cand < 8:
        assert (np.diff(mids) > 0).all()  # genuinely subdivided
    # widths sum to the candidate span (uniform pdf over the few candidates)
    np.testing.assert_allclose(
        float((s.t_ends - s.t_starts).sum()), float((te - tb).sum()), rtol=1e-5
    )


def test_proposal_gradients_flow_to_origins():
    state = occ_lib.init_occ_grid(SMALL_GRID)
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])

    def f(origins):
        b = bundle.replace(origins=origins)
        s = march.march_rays(b, state, SMALL_GRID, MARCH_PROP)
        return jnp.sum(s.positions * s.mask[..., None])

    g = jax.grad(f)(bundle.origins)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_weights_analytic_constant_density():
    """Uniform density sigma over [0, L]: total weight = 1 - exp(-sigma*L)."""
    k = 32
    t = jnp.linspace(0.0, 1.0, k + 1)
    samples = RaySamples(
        positions=jnp.zeros((1, k, 3)),
        directions=jnp.zeros((1, k, 3)),
        t_starts=t[None, :-1],
        t_ends=t[None, 1:],
        mask=jnp.ones((1, k), bool),
    )
    sigma = 3.0
    w = composite.render_weights(
        samples, jnp.full((1, k, 1), sigma), alpha_thre=0.0, early_stop_eps=0.0
    )
    np.testing.assert_allclose(float(w.sum()), 1 - np.exp(-sigma), atol=1e-5)
    # first weight = alpha of first interval
    np.testing.assert_allclose(
        float(w[0, 0]), 1 - np.exp(-sigma / k), atol=1e-6
    )


def test_weights_masked_samples_ignored():
    k = 8
    t = jnp.linspace(0.0, 1.0, k + 1)
    mask = jnp.array([[True] * 4 + [False] * 4])
    samples = RaySamples(
        positions=jnp.zeros((1, k, 3)),
        directions=jnp.zeros((1, k, 3)),
        t_starts=t[None, :-1],
        t_ends=t[None, 1:],
        mask=mask,
    )
    w = composite.render_weights(samples, jnp.full((1, k, 1), 100.0), 0.0, 0.0)
    assert float(jnp.abs(w[0, 4:]).max()) == 0.0


def test_weights_inf_density_stays_finite():
    """An overflowed density (trunc_exp forward is unclamped exp) must not
    poison the weights: nerfacc's iterative T *= (1-alpha) saturates
    (alpha=1, T=0) instead of forming inf-inf. Regression for the
    golden-run NaN at occupancy convergence (~step 1500). Both placements:
    inf at a VALID sample (weights after it must be ~0, its own weight =
    its transmittance) and inf at a MASKED sample (0 * inf hazard)."""
    k = 8
    t = jnp.linspace(0.0, 1.0, k + 1)

    def mk(mask):
        return RaySamples(
            positions=jnp.zeros((1, k, 3)),
            directions=jnp.zeros((1, k, 3)),
            t_starts=t[None, :-1],
            t_ends=t[None, 1:],
            mask=mask,
        )

    dens = jnp.full((1, k, 1), 3.0).at[0, 3, 0].set(jnp.inf)
    w = composite.render_weights(mk(jnp.ones((1, k), bool)), dens, 0.0, 0.0)
    assert bool(jnp.isfinite(w).all())
    np.testing.assert_allclose(np.asarray(w[0, 4:]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(w[0, 3]), np.exp(-3.0 * 3 / k), rtol=1e-5)
    # the finite prefix matches the all-finite computation exactly
    w_ref = composite.render_weights(
        mk(jnp.ones((1, k), bool)), jnp.full((1, k, 1), 3.0), 0.0, 0.0
    )
    np.testing.assert_allclose(np.asarray(w[0, :3]), np.asarray(w_ref[0, :3]),
                               rtol=1e-6)

    mask = jnp.ones((1, k), bool).at[0, 3].set(False)
    w2 = composite.render_weights(mk(mask), dens, 0.0, 0.0)
    assert bool(jnp.isfinite(w2).all())
    assert float(w2[0, 3]) == 0.0
    # gradients through the masked-inf case stay finite too
    g = jax.grad(
        lambda d: composite.render_weights(mk(mask), d, 0.0, 0.0).sum()
    )(jnp.where(jnp.isinf(dens), 1e4, dens))
    assert bool(jnp.isfinite(g).all())


def test_weights_dynamic_alpha_threshold():
    """nerfacc rule (lse_grid_estimator.py:113): the effective cull threshold
    is min(alpha_thre, occs.mean()). On a sparse-mean grid (early training)
    a sample whose alpha sits between the grid mean and the static threshold
    must SURVIVE — the static-0.01 rule would wrongly cull it."""
    k = 8
    t = jnp.linspace(0.0, 1.0, k + 1)
    samples = RaySamples(
        positions=jnp.zeros((1, k, 3)),
        directions=jnp.zeros((1, k, 3)),
        t_starts=t[None, :-1],
        t_ends=t[None, 1:],
        mask=jnp.ones((1, k), bool),
    )
    # alpha per sample = 1 - exp(-sigma/k); pick sigma so alpha ~ 0.005
    sigma = -k * np.log(1 - 0.005)
    dens = jnp.full((1, k, 1), sigma)
    # static threshold 0.01 culls everything
    w_static = composite.render_weights(samples, dens, 0.01, 0.0)
    assert float(w_static.sum()) == 0.0
    # dynamic min(0.01, mean=0.001): alpha 0.005 > 0.001 survives
    w_dyn = composite.render_weights(samples, dens, jnp.minimum(0.01, 0.001), 0.0)
    w_none = composite.render_weights(samples, dens, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(w_dyn), np.asarray(w_none), rtol=1e-6)
    # traced threshold culls identically to the same static value
    w_tr = composite.render_weights(samples, dens, jnp.float32(0.01), 0.0)
    np.testing.assert_allclose(np.asarray(w_tr), np.asarray(w_static))


def test_model_threads_grid_mean_into_alpha_thre():
    """render_bundle passes min(config.alpha_thre, occ.occs.mean()): with a
    nearly-empty EMA grid (tiny mean) the sub-threshold surface must render;
    with a saturated grid (mean >> alpha_thre) it must be culled."""
    from lsenerf_tpu.models import lsenerf as model_lib
    from lsenerf_tpu.models import field as field_lib
    from lsenerf_tpu.ops import hash_encoding as he
    from lsenerf_tpu.cameras.rays import RayBundle

    cfg = model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            hash=he.HashEncodingConfig(
                num_levels=2, log2_hashmap_size=8, base_res=4, max_res=8
            ),
            use_contraction=False,
        ),
        grid=SMALL_GRID,
        render_step_size=0.1,
        max_samples=16,
        max_candidates=64,
        far_plane=8.0,
        alpha_thre=0.9,  # absurdly high static threshold
        early_stop_eps=0.0,
    ).normalized()
    params = model_lib.init_model(jax.random.PRNGKey(0), cfg)
    n = 4
    bundle = RayBundle(
        origins=jnp.tile(jnp.array([[-3.0, 0.0, 0.0]]), (n, 1)),
        directions=jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1)),
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        metadata={"appearance_id": jnp.zeros((n,), jnp.int32)},
    )
    base = occ_lib.init_occ_grid(SMALL_GRID)
    # grid A: binaries all on, EMA mean tiny -> dynamic threshold ~ 1e-4,
    # so even soft densities composite to weight > 0
    lo = occ_lib.OccGridState(
        occs=jnp.full_like(base.occs, 1e-4), binaries=jnp.ones_like(base.binaries)
    )
    out_lo = model_lib.render_bundle(params, bundle, lo, cfg, train=False)
    # grid B: binaries all on, EMA mean saturated -> threshold = 0.9 and the
    # (randomly-initialized, soft) field alphas are all culled
    hi = occ_lib.OccGridState(
        occs=jnp.ones_like(base.occs), binaries=jnp.ones_like(base.binaries)
    )
    out_hi = model_lib.render_bundle(params, bundle, hi, cfg, train=False)
    assert float(out_hi["accumulation"].max()) == 0.0
    assert float(out_lo["accumulation"].max()) > 0.0


def test_eval_render_ignores_proposal():
    """Proposal relocation is a TRAINING-time lever: train=False renders
    must evaluate every occupied sample (reference eval semantics,
    lse_grid_estimator.py:93-143) — measured -0.24 dB / -0.019 SSIM of pure
    render-time loss otherwise (scripts/probe_eval_proposal.py)."""
    from dataclasses import replace as dc_replace

    from lsenerf_tpu.cameras.rays import RayBundle
    from lsenerf_tpu.models import field as field_lib
    from lsenerf_tpu.models import lsenerf as model_lib
    from lsenerf_tpu.ops import hash_encoding as he

    cfg16 = model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            hash=he.HashEncodingConfig(
                num_levels=2, log2_hashmap_size=8, base_res=4, max_res=8
            ),
            use_contraction=False,
        ),
        grid=SMALL_GRID,
        render_step_size=0.1,
        max_samples=16,
        max_candidates=64,
        far_plane=8.0,
        early_stop_eps=0.0,
        proposal_samples=4,
    ).normalized()
    cfg0 = dc_replace(cfg16, proposal_samples=0)
    params = model_lib.init_model(jax.random.PRNGKey(0), cfg16)
    n = 4
    bundle = RayBundle(
        origins=jnp.tile(jnp.array([[-3.0, 0.0, 0.0]]), (n, 1)),
        directions=jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1)),
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        metadata={"appearance_id": jnp.zeros((n,), jnp.int32)},
    )
    base = occ_lib.init_occ_grid(SMALL_GRID)
    occ = occ_lib.OccGridState(
        occs=jnp.full_like(base.occs, 0.5),
        binaries=jnp.ones_like(base.binaries),
    )
    # eval render at F=4 == eval render with proposal off (full sampler)
    out16 = model_lib.render_bundle(params, bundle, occ, cfg16, train=False)
    out0 = model_lib.render_bundle(params, bundle, occ, cfg0, train=False)
    np.testing.assert_allclose(
        np.asarray(out16["rgb"]), np.asarray(out0["rgb"]), rtol=1e-6
    )
    # while the TRAIN path at F=4 really does use the reduced budget
    tr16 = model_lib.render_bundle(params, bundle, occ, cfg16, train=True)
    tr0 = model_lib.render_bundle(params, bundle, occ, cfg0, train=True)
    assert float(jnp.mean(tr16["num_samples_per_ray"])) < float(
        jnp.mean(tr0["num_samples_per_ray"])
    )


def test_render_rgb_backgrounds():
    w = jnp.array([[0.5, 0.0]])
    rgbs = jnp.array([[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]])
    lin = composite.render_rgb(w, rgbs, "linear")
    np.testing.assert_allclose(np.asarray(lin), [[0.5, 0.0, 0.0]], atol=1e-6)
    white = composite.render_rgb(w, rgbs, "white")
    np.testing.assert_allclose(np.asarray(white), [[1.0, 0.5, 0.5]], atol=1e-6)
    last = composite.render_rgb(w, rgbs, "last_sample")
    np.testing.assert_allclose(np.asarray(last), [[0.5, 0.0, 0.5]], atol=1e-6)


def test_occupancy_lookup_levels():
    cfg = SMALL_GRID
    state = occ_lib.init_occ_grid(cfg)
    # point inside base aabb -> level 0; point outside -> level 1
    lv = occ_lib.level_of_positions(jnp.array([[0.5, 0, 0], [1.5, 0, 0]]), cfg)
    np.testing.assert_array_equal(np.asarray(lv), [0, 1])


def test_occupancy_updates_binarize_and_ema():
    cfg = occ_lib.OccGridConfig(resolution=8, levels=1, aabb_scale=1.0)
    state = occ_lib.init_occ_grid(cfg)
    # optimistic init: everything starts occupied
    assert bool(np.asarray(state.binaries).all())
    # repeated updates with density only at cell 100: unvisited cells decay
    # below the threshold (~90 updates at ema 0.95), cell 100 stays occupied
    dens = np.zeros((1, 8 * 8 * 8), np.float32)
    dens[0, 100] = 10.0
    for _ in range(120):
        state = occ_lib.full_update(state, jnp.asarray(dens), cfg)
    b = np.asarray(state.binaries).reshape(-1)
    assert b[100] and b.sum() == 1
    # sampled update: EMA decay applies to the refreshed cell
    cell_ids = jnp.asarray([[100]])
    state2 = occ_lib.sampled_update(state, cell_ids, jnp.asarray([[0.0]]), cfg)
    occ_after = float(np.asarray(state2.occs).reshape(-1)[100])
    np.testing.assert_allclose(occ_after, 10.0 * cfg.ema_decay, rtol=1e-5)


def test_sample_update_positions_in_bounds():
    cfg = occ_lib.OccGridConfig(resolution=8, levels=2, aabb_scale=1.0)
    ids, pos = occ_lib.sample_update_positions(jax.random.PRNGKey(0), cfg, 64)
    assert ids.shape == (2, 64) and pos.shape == (2, 64, 3)
    p = np.asarray(pos)
    assert np.abs(p[0]).max() <= 1.0 and np.abs(p[1]).max() <= 2.0
    assert np.abs(p[1]).max() > 1.0  # level 1 actually uses the bigger box


def test_compact_field_eval_matches_dense():
    """Compacted (chunk-skipping) field evaluation must match the dense path
    in values AND gradients."""
    from dataclasses import replace

    from lsenerf_tpu.models import embeddings as emb_lib
    from lsenerf_tpu.models import field as field_lib
    from lsenerf_tpu.models import lsenerf as model_lib
    from lsenerf_tpu.ops import hash_encoding as he
    from tests.test_cameras import make_cams
    from lsenerf_tpu.cameras import cameras as cam_lib

    cfg_dense = model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            hash=he.HashEncodingConfig(num_levels=4, log2_hashmap_size=8,
                                       base_res=4, max_res=32),
            use_contraction=False,
            embedding=emb_lib.EmbeddingConfig(emb_dim=8),
        ),
        grid=occ_lib.OccGridConfig(resolution=16, levels=1),
        max_samples=16, max_candidates=64, far_plane=6.0,
        render_step_size=0.1, cone_angle=0.0,
        compact_chunk=0,
    ).normalized()
    cfg_compact = replace(cfg_dense, compact_chunk=64)

    params = model_lib.init_model(jax.random.PRNGKey(0), cfg_dense, num_imgs=4)
    # half-occupied grid so some chunks are empty after sorting
    state = occ_lib.init_occ_grid(cfg_dense.grid)
    bins = np.zeros(np.asarray(state.binaries).shape, bool)
    bins[0, 6:10, 6:10, 6:10] = True
    state = occ_lib.OccGridState(occs=state.occs, binaries=jnp.asarray(bins))

    cams = make_cams(n=3)
    idx = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    coords = jnp.asarray(
        np.random.default_rng(0).integers(0, 40, size=(8, 2)).astype(np.float32)
    )
    bundle = cam_lib.generate_rays(cams, idx, coords)
    meta = dict(bundle.metadata)
    meta["appearance_id"] = jnp.zeros((8,), jnp.int32)
    bundle = bundle.replace(metadata=meta)

    out_d = model_lib.render_bundle(params, bundle, state, cfg_dense)
    out_c = model_lib.render_bundle(params, bundle, state, cfg_compact)
    np.testing.assert_allclose(
        np.asarray(out_c["rgb"]), np.asarray(out_d["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_c["depth"]), np.asarray(out_d["depth"]), atol=1e-5
    )

    def loss(p, cfg):
        return model_lib.render_bundle(p, bundle, state, cfg)["rgb"].sum()

    g_d = jax.grad(loss)(params, cfg_dense)
    g_c = jax.grad(loss)(params, cfg_compact)
    for ld, lc in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(ld), atol=1e-4)


# --- hierarchical (two-phase) marching ------------------------------------

HIER_GRID = occ_lib.OccGridConfig(resolution=32, levels=2, aabb_scale=1.0)


def hier_cfg(**kw):
    base = dict(
        render_step_size=0.02, near_plane=0.05, far_plane=100.0,
        cone_angle=0.004, max_samples=32, max_candidates=512,
        hierarchical=True, coarse_factor=8, max_coarse_segments=16,
    )
    base.update(kw)
    return march.MarchConfig(**base)


def test_super_binaries_conservative():
    """Any occupied fine cell must light up its own supercell (the march
    covers spatial slop by testing segment midpoints AND endpoints)."""
    rng = np.random.default_rng(0)
    cfg = HIER_GRID
    R, f = cfg.resolution, 8
    binaries = rng.random((cfg.levels, R, R, R)) < 0.01
    sup = np.asarray(
        occ_lib.build_super_binaries(jnp.asarray(binaries), f, cfg)
    )
    occ_cells = np.argwhere(binaries)
    for lvl, x, y, z in occ_cells:
        assert sup[lvl, x // f, y // f, z // f]
    # and no spurious occupancy far from any occupied fine cell: an empty
    # grid yields an empty supergrid
    empty = np.asarray(
        occ_lib.build_super_binaries(
            jnp.zeros((cfg.levels, R, R, R), bool), f, cfg
        )
    )
    assert not empty.any()


def test_super_binaries_cross_level():
    """A fine cell occupied at level 0 must be visible through level 1's
    supergrid at the overlapping (central) location, and vice versa."""
    cfg = HIER_GRID
    R, f = cfg.resolution, 8
    S = R // f
    binaries = np.zeros((2, R, R, R), bool)
    # level 0, cell near +x face -> position x ~ +1 (center of cell (R-1, R/2, R/2))
    binaries[0, R - 1, R // 2, R // 2] = True
    sup = np.asarray(occ_lib.build_super_binaries(jnp.asarray(binaries), f, cfg))
    # the same world position in level 1's frame: x ~ +1 = half of level-1
    # extent -> supercell index ~ 3S/4
    assert sup[1, 3 * S // 4 - 1 : 3 * S // 4 + 1, :, :].any()


def test_hier_guard_indivisible_supergrid():
    """grid_resolution=120 / coarse_factor=8 gives S=15: the adjacent-level
    merge needs S % 4 == 0, so the march must fall back to the flat path
    instead of crashing at trace time (ADVICE r2), and build_super_binaries
    must not crash if called directly."""
    gcfg = occ_lib.OccGridConfig(resolution=120, levels=4)
    cfg = march.MarchConfig(
        render_step_size=0.05, max_samples=16, max_candidates=256,
        hierarchical=True, coarse_factor=8, max_coarse_segments=8,
    )
    state = occ_lib.init_occ_grid(gcfg)
    rng = np.random.default_rng(0)
    origins = np.array([[-3.0, 0.0, 0.0]] * 4)
    dirs = np.concatenate(
        [np.ones((4, 1)), 0.3 * (rng.random((4, 2)) - 0.5)], axis=1
    )
    s = march.march_rays(make_bundle(origins, dirs), state, gcfg, cfg)
    assert np.asarray(s.mask).sum() > 0
    sup = occ_lib.build_super_binaries(state.binaries, 8, gcfg)
    assert np.asarray(sup).all()  # fresh grid: fully occupied, un-merged


def test_hierarchical_matches_flat_when_sparse():
    """Converged-grid regime (occupied segments fit every budget): the
    two-phase march must produce EXACTLY the flat scan's samples."""
    cfg_h = hier_cfg()
    cfg_f = hier_cfg(hierarchical=False)
    state = occ_lib.init_occ_grid(HIER_GRID)
    occs = np.zeros(np.asarray(state.occs).shape, np.float32)
    binaries = np.zeros_like(occs, bool)
    # a thin occupied slab at level 0: x in [0.25, 0.5]
    R = HIER_GRID.resolution
    binaries[0, 5 * R // 8 : 6 * R // 8, :, :] = True
    state = occ_lib.OccGridState(
        occs=jnp.asarray(occs), binaries=jnp.asarray(binaries)
    )
    rng = np.random.default_rng(1)
    origins = np.array([[-3.0, 0.0, 0.0]] * 8)
    dirs = np.concatenate(
        [np.ones((8, 1)), 0.3 * (rng.random((8, 2)) - 0.5)], axis=1
    )
    bundle = make_bundle(origins, dirs)
    sh = march.march_rays(bundle, state, HIER_GRID, cfg_h)
    sf = march.march_rays(bundle, state, HIER_GRID, cfg_f)
    np.testing.assert_array_equal(np.asarray(sh.mask), np.asarray(sf.mask))
    m = np.asarray(sf.mask)
    np.testing.assert_allclose(
        np.asarray(sh.t_starts)[m], np.asarray(sf.t_starts)[m], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh.t_ends)[m], np.asarray(sf.t_ends)[m], atol=1e-5
    )
    assert m.sum() > 0


def test_hierarchical_full_grid_spans_range():
    """Startup regime (fully occupied grid): the two-phase march must still
    spread samples across the whole range (no startup deadlock)."""
    state = occ_lib.init_occ_grid(HIER_GRID)
    cfg = hier_cfg()
    bundle = make_bundle([[-3.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    s = march.march_rays(bundle, state, HIER_GRID, cfg)
    m = np.asarray(s.mask[0])
    assert cfg.max_samples // 2 < m.sum() <= cfg.max_samples
    t0 = np.asarray(s.t_starts[0])
    t1 = np.asarray(s.t_ends[0])
    outer_half = HIER_GRID.aabb_scale * 2.0 ** (HIER_GRID.levels - 1)
    t_hi = min(outer_half + 3.0, cfg.far_plane)
    assert abs(t0[0] - 1.0) < 0.2
    assert t1[m.sum() - 1] > 0.8 * t_hi
    covered = (t1 - t0)[: m.sum()].sum()
    span = t1[m.sum() - 1] - t0[0]
    assert covered > 0.6 * span
    assert (np.diff(t0[: m.sum()]) > 0).all()


def test_grid_lookup_matmul_matches_gather():
    """The one-hot MXU lookup (ops/occupancy._grid_lookup_matmul) is exact vs
    the row-gather lookup on random coordinates across all levels."""
    rng = np.random.default_rng(7)
    cfg = occ_lib.OccGridConfig(resolution=16, levels=2, aabb_scale=1.0)
    binaries = jnp.asarray(rng.random((2, 16, 16, 16)) < 0.4)
    pts = rng.uniform(-1.9, 1.9, size=(3, 257, 5)).astype(np.float32)
    x, y, z = (jnp.asarray(p) for p in pts)
    ref = occ_lib._grid_lookup(binaries, x, y, z, cfg)
    got = occ_lib._grid_lookup_matmul(binaries, x, y, z, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_segment_lookup_contract():
    """packed_segment_lookup vs the plain per-midpoint lookup: NEVER drops an
    occupied midpoint (the conservative direction is exact), and the extra
    conservative keeps (third-supercell corner crossings) are rare."""
    rng = np.random.default_rng(0)
    cfg = occ_lib.OccGridConfig(resolution=64, levels=4)
    binaries = jnp.asarray(rng.random((4, 64, 64, 64)) < 0.3)
    n, k1, cf = 128, 12, 8
    o = jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    t0 = rng.uniform(0.05, 3.0, (n, k1, 1))
    mids = jnp.asarray(
        (t0 + np.sort(rng.uniform(0, 0.08, (n, k1, cf)), axis=-1)).astype(
            np.float32
        )
    )
    packed = np.asarray(march.packed_segment_lookup(binaries, o, d, mids, cfg))
    flat = mids.reshape(n, k1 * cf)
    plain = np.asarray(
        occ_lib._grid_lookup(
            binaries,
            o[:, None, 0] + flat * d[:, None, 0],
            o[:, None, 1] + flat * d[:, None, 1],
            o[:, None, 2] + flat * d[:, None, 2],
            cfg,
        )
    )
    assert (~packed & plain).sum() == 0  # no drops, ever
    assert (packed != plain).mean() < 0.02  # conservative extras are rare
    assert (packed == plain).mean() > 0.95


def test_march_packed_phase2_no_drops():
    """packed_phase2 marching must cover at least the plain phase-2 samples
    (identical on matched supercells; conservative extras only)."""
    state = occ_lib.init_occ_grid(HIER_GRID)
    occs = np.zeros(np.asarray(state.occs).shape, np.float32)
    binaries = np.zeros_like(occs, bool)
    rng = np.random.default_rng(5)
    # sparse enough that both variants stay under the sample budget (the
    # containment assertion needs stride==1 in both runs)
    binaries[0][rng.random(binaries.shape[1:]) < 0.05] = True
    state = occ_lib.OccGridState(
        occs=jnp.asarray(occs), binaries=jnp.asarray(binaries)
    )
    origins = np.array([[-3.0, 0.0, 0.0]] * 8)
    dirs = np.concatenate(
        [np.ones((8, 1)), 0.4 * (rng.random((8, 2)) - 0.5)], axis=1
    )
    bundle = make_bundle(origins, dirs)
    s_plain = march.march_rays(
        bundle, state, HIER_GRID, hier_cfg(packed_phase2=False)
    )
    s_pack = march.march_rays(
        bundle, state, HIER_GRID, hier_cfg(packed_phase2=True)
    )
    # under-budget regime: every plain t_start must appear among the packed
    # t_starts of the same ray (packed may add a few conservative samples)
    for r in range(8):
        mp = np.asarray(s_plain.mask[r])
        tp = np.asarray(s_plain.t_starts[r])[mp]
        mk = np.asarray(s_pack.mask[r])
        tk = np.asarray(s_pack.t_starts[r])[mk]
        for t in tp:
            assert np.min(np.abs(tk - t)) < 1e-5, (r, t)


def test_march_supergrid_matmul_matches_gather():
    """supergrid_matmul=True must march identically to the gather phase 1."""
    state = occ_lib.init_occ_grid(HIER_GRID)
    occs = np.zeros(np.asarray(state.occs).shape, np.float32)
    binaries = np.zeros_like(occs, bool)
    rng = np.random.default_rng(3)
    binaries[0][rng.random(binaries.shape[1:]) < 0.15] = True
    state = occ_lib.OccGridState(
        occs=jnp.asarray(occs), binaries=jnp.asarray(binaries)
    )
    origins = np.array([[-3.0, 0.0, 0.0]] * 6)
    dirs = np.concatenate(
        [np.ones((6, 1)), 0.4 * (rng.random((6, 2)) - 0.5)], axis=1
    )
    bundle = make_bundle(origins, dirs)
    s_g = march.march_rays(
        bundle, state, HIER_GRID, hier_cfg(supergrid_matmul=False)
    )
    s_m = march.march_rays(
        bundle, state, HIER_GRID, hier_cfg(supergrid_matmul=True)
    )
    np.testing.assert_array_equal(np.asarray(s_m.mask), np.asarray(s_g.mask))
    m = np.asarray(s_g.mask)
    np.testing.assert_allclose(
        np.asarray(s_m.t_starts)[m], np.asarray(s_g.t_starts)[m], atol=1e-6
    )


def test_occ_init_jitter_spreads_threshold_crossing():
    """Jittered optimistic init: never-refreshed cells cross occ_thre over
    a spread of updates, not all on the same one (the step-1440 march-
    distribution cliff), while every cell still starts occupied."""
    cfg = occ_lib.OccGridConfig(resolution=8, levels=1, aabb_scale=1.0)
    state = occ_lib.init_occ_grid(cfg)
    occs = np.asarray(state.occs).reshape(-1)
    assert bool(np.asarray(state.binaries).all())
    assert occs.min() > cfg.occ_thre  # all above threshold at init
    # updates-to-cross varies by >= 30 updates across cells
    cross = np.log(cfg.occ_thre / occs) / np.log(cfg.ema_decay)
    assert cross.max() - cross.min() >= 30.0
    # and no cell survives past the un-jittered bound (~90 updates)
    assert cross.max() <= np.log(cfg.occ_thre) / np.log(cfg.ema_decay) + 1.0
