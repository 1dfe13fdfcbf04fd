"""Blocked hash-grid layout: numpy oracle + gradient tests.

The blocked layout (ops/hash_encoding.py hash_encode_blocked) must equal a
straightforward scalar implementation of its definition: for each sample and
level, find the interpolation cube base b, the 3x3x3 block k = b >> 1, fetch
the block row, and trilinearly blend the 8 cube corners read from block-
relative positions (b & 1) + delta.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsenerf_tpu.ops import hash_encoding as he

_PRIMES = (1, 2654435761, 805459861)


def _oracle_blocked(table, positions, cfg):
    table = np.asarray(table, np.float64)
    positions = np.asarray(positions, np.float64)
    n = positions.shape[0]
    L, F = cfg.num_levels, cfg.features_per_level
    n_hash = 2**cfg.blocked_rows_log2
    scal = cfg.scalings()
    bdims = cfg.blocked_level_bdims()
    level_rows = cfg.blocked_level_rows()
    offsets = np.concatenate([[0], np.cumsum(level_rows)[:-1]]).astype(np.int64)

    out = np.zeros((n, L * F))
    for m in range(n):
        for l in range(L):
            R = int(scal[l])
            s = positions[m] * scal[l]
            b = np.clip(np.floor(s).astype(np.int64), 0, R - 1)
            w = s - b
            k = b >> 1
            o = b & 1
            if level_rows[l] < n_hash:
                bd = int(bdims[l])
                key = (k[0] * bd + k[1]) * bd + k[2]
            else:
                h = (
                    np.uint32(k[0] * _PRIMES[0])
                    ^ np.uint32(k[1] * _PRIMES[1])
                    ^ np.uint32(k[2] * _PRIMES[2])
                )
                key = int(h & np.uint32(n_hash - 1))
            row = table[offsets[l] + key]
            feat = np.zeros(F)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        r = (o[0] + dx) * 9 + (o[1] + dy) * 3 + (o[2] + dz)
                        wt = (
                            (w[0] if dx else 1 - w[0])
                            * (w[1] if dy else 1 - w[1])
                            * (w[2] if dz else 1 - w[2])
                        )
                        feat += wt * row[r * F : r * F + F]
            out[m, l * F : (l + 1) * F] = feat
    return out


@pytest.fixture(scope="module")
def cfg():
    return he.HashEncodingConfig(
        num_levels=4,
        log2_hashmap_size=10,
        base_res=4,
        max_res=64,
        layout="blocked",
        blocked_rows_log2=8,
    )


def test_blocked_table_shape(cfg):
    tab = he.init_hash_table(jax.random.PRNGKey(0), cfg)
    total = int(cfg.blocked_level_rows().sum())
    assert tab.shape == (total, cfg.blocked_row_width)
    # level 0 (res 4 -> bdim 2 -> 8 rows) is dense; finest is hashed at 2^8
    assert cfg.blocked_level_rows()[0] == 8
    assert cfg.blocked_level_rows()[-1] == 256


def test_blocked_matches_oracle(cfg):
    key = jax.random.PRNGKey(1)
    tab = he.init_hash_table(key, cfg) * 1000.0  # O(1) values
    pos = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=0.001,
                             maxval=0.999)
    got = np.asarray(he.hash_encode(tab, pos, cfg))
    want = _oracle_blocked(tab, pos, cfg)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_blocked_boundary_positions(cfg):
    """Exact 0/1 coordinates and lattice-aligned points must not go out of
    range (clip semantics) or produce NaNs."""
    tab = he.init_hash_table(jax.random.PRNGKey(1), cfg)
    pos = jnp.asarray(
        [
            [0.0, 0.0, 0.0],
            [1.0, 1.0, 1.0],
            [0.5, 0.5, 0.5],
            [0.25, 0.75, 1.0],
        ]
    )
    out = he.hash_encode(tab, pos, cfg)
    assert np.isfinite(np.asarray(out)).all()
    want = _oracle_blocked(tab, pos, cfg)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-6)


def test_blocked_grads_flow(cfg):
    """Gradients must flow to the table (row scatter) AND to the positions
    (trilinear weights) — the pose-optimization path depends on the latter."""
    tab = he.init_hash_table(jax.random.PRNGKey(1), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(2), (32, 3), minval=0.01,
                             maxval=0.99)

    def loss(t, p):
        return (he.hash_encode(t, p, cfg) ** 2).sum()

    gt, gp = jax.grad(loss, argnums=(0, 1))(tab, pos)
    assert float(jnp.abs(gt).sum()) > 0
    assert float(jnp.abs(gp).sum()) > 0
    assert np.isfinite(np.asarray(gt)).all() and np.isfinite(np.asarray(gp)).all()


def test_blocked_position_grad_finite_diff(cfg):
    """d(encode)/d(position) against central differences."""
    tab = he.init_hash_table(jax.random.PRNGKey(3), cfg) * 100.0
    pos = jnp.asarray([[0.341, 0.577, 0.213]])
    probe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.out_dim))

    def f(p):
        return (he.hash_encode(tab, p, cfg) * probe).sum()

    g = jax.grad(f)(pos)
    eps = 1e-4
    for d in range(3):
        e = jnp.zeros_like(pos).at[0, d].set(eps)
        fd = (f(pos + e) - f(pos - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, d]), float(fd), rtol=1e-3, atol=1e-4)


def test_blocked_table_grad_matches_scatter(cfg):
    """The windowed backward (TPU path) and the plain scatter backward agree.

    On CPU the scatter path is used; exercise the windowed routine directly
    via sorted_window_accumulate against a numpy scatter oracle with
    row-width > 4 (the row-gather permute branch).
    """
    from lsenerf_tpu.ops.fast_gather import sorted_window_accumulate

    rng = np.random.default_rng(0)
    T, W, m = 300, 64, 5000
    idx = rng.integers(0, T, m).astype(np.int32)
    g = rng.standard_normal((m, W)).astype(np.float32)
    got = np.asarray(
        sorted_window_accumulate(jnp.asarray(idx), jnp.asarray(g), T, window=128)
    )
    want = np.zeros((T, W), np.float32)
    np.add.at(want, idx, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dense_rows", [0, 27, 4096])
def test_factored_backward_matches_autodiff(cfg, dense_rows):
    """The factored table/position gradients (sort 5 scalar factors, rebuild
    rank-1 rows in-window) equal the materialized-row autodiff path — with
    the dense-prefix one-hot accumulate off (0), partial (27: level 0 only),
    and covering every level (4096)."""
    from dataclasses import replace

    cfg_fast = replace(cfg, blocked_backward="factored",
                       dense_grad_rows=dense_rows)
    cfg_ref = replace(cfg, blocked_backward="autodiff")
    tab = he.init_hash_table(jax.random.PRNGKey(5), cfg) * 10.0
    pos = jax.random.uniform(jax.random.PRNGKey(6), (257, 3), minval=0.0,
                             maxval=1.0)
    probe = jax.random.normal(jax.random.PRNGKey(7), (257, cfg.out_dim))

    def loss(c):
        return lambda t, p: (he.hash_encode(t, p, c) * probe).sum()

    out_fast = he.hash_encode(tab, pos, cfg_fast)
    out_ref = he.hash_encode(tab, pos, cfg_ref)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)

    gt_f, gp_f = jax.grad(loss(cfg_fast), argnums=(0, 1))(tab, pos)
    gt_r, gp_r = jax.grad(loss(cfg_ref), argnums=(0, 1))(tab, pos)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r),
                               rtol=1e-4, atol=1e-5)


def test_dense_prefix_no_overflow_drop(cfg):
    """Coarse dense levels concentrate one update PER SAMPLE into a handful
    of rows, far beyond the windowed accumulate's per-window cap — the
    sorted path silently drops the tail there. The dense-prefix one-hot
    accumulate must be EXACT for those levels: all samples in one
    interpolation cube, update count >> cap."""
    from dataclasses import replace

    cfg_dense = replace(cfg, blocked_backward="factored", dense_grad_rows=4096)
    tab = he.init_hash_table(jax.random.PRNGKey(10), cfg) * 10.0
    n = 4096  # every level sees 4096 updates on a single row
    base = jnp.asarray([[0.301, 0.502, 0.703]])
    pos = jnp.clip(
        base + 1e-4 * jax.random.normal(jax.random.PRNGKey(11), (n, 3)), 0, 1
    )

    def loss(c):
        return lambda t: (he.hash_encode(t, pos, c) ** 2).sum()

    gt_dense = np.asarray(jax.grad(loss(cfg_dense))(tab))
    gt_ref = np.asarray(jax.grad(loss(replace(cfg, blocked_backward="autodiff")))(tab))
    # CPU autodiff oracle scatters exactly; the dense path must match it
    scale = np.abs(gt_ref).max()
    np.testing.assert_allclose(gt_dense, gt_ref, atol=1e-4 * scale, rtol=1e-4)
    # sanity: the gradient mass is real (thousands of stacked updates)
    assert scale > 0


def test_all_dense_keyed_levels_take_exact_path():
    """ADVICE r2: a dense-keyed level with rows in (dense_grad_rows, 2^bits)
    must STILL take the exact one-hot gradient path — dense keys are
    spatially correlated, so occupancy-clustered samples can exceed any
    sorted-window cap there."""
    from dataclasses import replace

    cfg2 = he.HashEncodingConfig(
        num_levels=4, log2_hashmap_size=10, base_res=4, max_res=64,
        layout="blocked", blocked_rows_log2=12, dense_grad_rows=64,
    )
    rows = cfg2.blocked_level_rows()
    # the setup reproduces the flagged shape: level 2 is dense-keyed (2197
    # rows) yet far above dense_grad_rows
    assert rows[2] == 2197 and rows[2] > cfg2.dense_grad_rows
    assert he._dense_level_count(cfg2) == 3  # levels 0..2 dense-keyed

    tab = he.init_hash_table(jax.random.PRNGKey(20), cfg2) * 10.0
    # all samples inside ONE interpolation cube: every level gets n updates
    # on a single row — the exact worst case for a capped window
    n = 2048
    base = jnp.asarray([[0.581, 0.322, 0.147]])
    pos = jnp.clip(
        base + 1e-4 * jax.random.normal(jax.random.PRNGKey(21), (n, 3)), 0, 1
    )

    def loss(c):
        return lambda t: (he.hash_encode(t, pos, c) ** 2).sum()

    gt = np.asarray(jax.grad(loss(cfg2))(tab))
    gt_ref = np.asarray(
        jax.grad(loss(replace(cfg2, blocked_backward="autodiff")))(tab)
    )
    # dense-keyed levels (the table's leading rows) must be EXACT; the
    # hashed level 3 legitimately overflows under this adversarial
    # concentration (2048 updates on one key) — which the telemetry reports
    dense_total = int(cfg2.blocked_level_rows()[:3].sum())
    scale = np.abs(gt_ref[:dense_total]).max()
    assert scale > 0
    np.testing.assert_allclose(
        gt[:dense_total], gt_ref[:dense_total], atol=1e-4 * scale, rtol=1e-4
    )
    assert int(he.blocked_overflow_count(pos, cfg2)) > 0


def test_dense_fwd_matmul_matches_gather(cfg):
    """dense_fwd_rows routes small-table levels through a one-hot MXU matmul;
    values and gradients must equal the plain-gather path."""
    from dataclasses import replace

    cfg_fwd = replace(cfg, dense_fwd_rows=256)
    tab = he.init_hash_table(jax.random.PRNGKey(40), cfg) * 100.0
    pos = jax.random.uniform(jax.random.PRNGKey(41), (128, 3))
    out_a = np.asarray(he.hash_encode(tab, pos, cfg))
    out_b = np.asarray(he.hash_encode(tab, pos, cfg_fwd))
    np.testing.assert_allclose(out_b, out_a, rtol=1e-5, atol=1e-5)

    def loss(c):
        return lambda t, p: (he.hash_encode(t, p, c) ** 2).sum()

    gt_a, gp_a = jax.grad(loss(cfg), argnums=(0, 1))(tab, pos)
    gt_b, gp_b = jax.grad(loss(cfg_fwd), argnums=(0, 1))(tab, pos)
    np.testing.assert_allclose(np.asarray(gt_b), np.asarray(gt_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_b), np.asarray(gp_a),
                               rtol=1e-4, atol=1e-4)


def test_window_overflow_count_exact():
    from lsenerf_tpu.ops.fast_gather import window_overflow_count

    # 3 windows of 4 slots; max_updates 5: window 0 gets 8 updates on slot 1
    # (drops 3), window 2 gets 2 (fits)
    idx = jnp.asarray([1] * 8 + [9, 10], jnp.int32)
    got = int(window_overflow_count(idx, table_len=12, window=4, max_updates=5))
    assert got == 3
    # everything fits -> 0
    assert int(window_overflow_count(idx, 12, 4, 8)) == 0


def test_blocked_overflow_telemetry():
    """Uniform positions never overflow the 3x-mean cap; adversarially
    concentrated samples are DETECTED by the counter (the silent-drop class
    from VERDICT r2 weak #4 is now observable). Needs a hashed level with
    enough rows for multiple accumulate windows (4096 rows, window 512)."""
    cfg2 = he.HashEncodingConfig(
        num_levels=4, log2_hashmap_size=10, base_res=4, max_res=64,
        layout="blocked", blocked_rows_log2=12, dense_grad_rows=64,
    )
    assert he._dense_level_count(cfg2) == 3  # level 3 hashed at 4096 rows
    pos_u = jax.random.uniform(jax.random.PRNGKey(30), (4096, 3))
    assert int(he.blocked_overflow_count(pos_u, cfg2)) == 0
    base = jnp.asarray([[0.917, 0.401, 0.222]])
    pos_c = jnp.clip(
        base + 1e-5 * jax.random.normal(jax.random.PRNGKey(31), (4096, 3)), 0, 1
    )
    assert int(he.blocked_overflow_count(pos_c, cfg2)) > 0


def test_factored_backward_bf16_close(cfg):
    """bf16 factor payloads quantize the update weights; the accumulated
    table grad must stay within bf16-level tolerance of the f32 oracle."""
    from dataclasses import replace

    cfg_bf = replace(cfg, blocked_backward="factored", gather_dtype="bfloat16")
    cfg_ref = replace(cfg, blocked_backward="autodiff")
    tab = he.init_hash_table(jax.random.PRNGKey(8), cfg) * 10.0
    pos = jax.random.uniform(jax.random.PRNGKey(9), (300, 3))

    def loss(c):
        return lambda t: (he.hash_encode(t, pos, c) ** 2).sum()

    gt_bf = np.asarray(jax.grad(loss(cfg_bf))(tab))
    gt_ref = np.asarray(jax.grad(loss(cfg_ref))(tab))
    scale = np.abs(gt_ref).max()
    np.testing.assert_allclose(gt_bf, gt_ref, atol=0.03 * scale)


def test_pallas_combine_matches_xla(cfg):
    """The Pallas fused combine (interpret mode on CPU) must equal the XLA
    combine path — outputs AND both gradient paths."""
    from dataclasses import replace

    cfg_p = replace(cfg, blocked_backward="factored", combine_impl="pallas")
    cfg_x = replace(cfg, blocked_backward="factored", combine_impl="xla")
    tab = he.init_hash_table(jax.random.PRNGKey(12), cfg) * 10.0
    pos = jax.random.uniform(jax.random.PRNGKey(13), (301, 3))
    probe = jax.random.normal(jax.random.PRNGKey(14), (301, cfg.out_dim))

    out_p = np.asarray(he.hash_encode(tab, pos, cfg_p))
    out_x = np.asarray(he.hash_encode(tab, pos, cfg_x))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    def loss(c):
        return lambda t, p: (he.hash_encode(t, p, c) * probe).sum()

    gt_p, gp_p = jax.grad(loss(cfg_p), argnums=(0, 1))(tab, pos)
    gt_x, gp_x = jax.grad(loss(cfg_x), argnums=(0, 1))(tab, pos)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_combine_unit():
    """Kernel-level check against a direct numpy trilinear contraction."""
    from lsenerf_tpu.ops import pallas_combine

    rng = np.random.default_rng(3)
    m, F = 37, 2
    rows = rng.standard_normal((m, 64)).astype(np.float32)
    o = rng.integers(0, 2, (3, m)).astype(np.float32)
    w = rng.random((3, m)).astype(np.float32)
    e = o + w

    got = np.asarray(
        pallas_combine.combine(
            jnp.asarray(rows), jnp.asarray(e[0]), jnp.asarray(e[1]),
            jnp.asarray(e[2]), F,
        )
    )

    def u(ov, wv):
        return np.stack(
            [(1 - wv) * (1 - ov), wv * (1 - ov) + (1 - wv) * ov, wv * ov]
        )

    ux, uy, uz = u(o[0], w[0]), u(o[1], w[1]), u(o[2], w[2])
    want = np.zeros((F, m))
    for vx in range(3):
        for vy in range(3):
            for vz in range(3):
                v = (vx * 3 + vy) * 3 + vz
                wt = ux[vx] * uy[vy] * uz[vz]
                for f in range(F):
                    want[f] += wt * rows[:, v * F + f]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("window,bw", [(128, 16), (1024, 4)])
def test_accum_tiling_exact(cfg, window, bw):
    """Non-default accumulate tilings (HashEncodingConfig.accum_window /
    accum_batch_windows, the ab_bench acc_* knobs) produce the same table
    gradient as the autodiff oracle — tiling is a pure performance knob."""
    from dataclasses import replace

    cfg_tiled = replace(cfg, blocked_backward="factored",
                        accum_window=window, accum_batch_windows=bw)
    cfg_ref = replace(cfg, blocked_backward="autodiff")
    tab = he.init_hash_table(jax.random.PRNGKey(8), cfg) * 10.0
    pos = jax.random.uniform(jax.random.PRNGKey(9), (301, 3), minval=0.0,
                             maxval=1.0)
    probe = jax.random.normal(jax.random.PRNGKey(10), (301, cfg.out_dim))

    def loss(c):
        return lambda t: (he.hash_encode(t, pos, c) * probe).sum()

    gt_t = jax.grad(loss(cfg_tiled))(tab)
    gt_r = jax.grad(loss(cfg_ref))(tab)
    np.testing.assert_allclose(np.asarray(gt_t), np.asarray(gt_r),
                               rtol=1e-4, atol=1e-5)
