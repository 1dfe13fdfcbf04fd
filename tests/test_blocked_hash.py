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
