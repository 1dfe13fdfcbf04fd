"""Golden-value and gradient tests for hash encoding, SH, embeddings, field."""

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.models import embeddings as emb_lib
from lsenerf_tpu.models import field as field_lib
from lsenerf_tpu.ops import hash_encoding as he
from lsenerf_tpu.ops import sh

SMALL_HASH = he.HashEncodingConfig(
    num_levels=4, features_per_level=2, log2_hashmap_size=8, base_res=4, max_res=32
)


def _np_hash_encode(table, positions, cfg):
    """Tiny numpy oracle with the same spec as ops/hash_encoding.py."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    L, F, T = cfg.num_levels, cfg.features_per_level, cfg.table_size
    scalings = cfg.scalings()
    out = np.zeros((len(positions), L * F), dtype=np.float64)
    for li in range(L):
        scaled = positions * scalings[li]
        base = np.floor(scaled).astype(np.int64)
        frac = scaled - base
        acc = np.zeros((len(positions), F))
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    c = base + np.array([i, j, k])
                    h = (
                        (c[:, 0].astype(np.uint64) * primes[0])
                        ^ (c[:, 1].astype(np.uint64) * primes[1])
                        ^ (c[:, 2].astype(np.uint64) * primes[2])
                    ) % np.uint64(2**32)
                    idx = (h & np.uint64(T - 1)).astype(np.int64) + li * T
                    w = (
                        (frac[:, 0] if i else 1 - frac[:, 0])
                        * (frac[:, 1] if j else 1 - frac[:, 1])
                        * (frac[:, 2] if k else 1 - frac[:, 2])
                    )
                    acc += np.asarray(table)[:, idx].T * w[:, None]
        out[:, li * F : (li + 1) * F] = acc
    return out


def test_hash_encode_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    table = he.init_hash_table(key, SMALL_HASH)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    got = np.asarray(he.hash_encode(table, pos, SMALL_HASH))
    want = _np_hash_encode(np.asarray(table), np.asarray(pos), SMALL_HASH)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hash_encode_interpolates_continuously():
    key = jax.random.PRNGKey(0)
    table = he.init_hash_table(key, SMALL_HASH)
    p0 = jnp.array([[0.3, 0.4, 0.5]])
    p1 = p0 + 1e-4
    f0 = he.hash_encode(table, p0, SMALL_HASH)
    f1 = he.hash_encode(table, p1, SMALL_HASH)
    assert float(jnp.abs(f1 - f0).max()) < 1e-2  # trilinear => Lipschitz


def test_hash_encode_grads_table_and_positions():
    key = jax.random.PRNGKey(0)
    table = he.init_hash_table(key, SMALL_HASH)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.05, maxval=0.95)

    g_table = jax.grad(lambda t: jnp.sum(he.hash_encode(t, pos, SMALL_HASH) ** 2))(table)
    assert float(jnp.abs(g_table).max()) > 0
    g_pos = jax.grad(lambda p: jnp.sum(he.hash_encode(table, p, SMALL_HASH) ** 2))(pos)
    assert float(jnp.abs(g_pos).max()) > 0
    assert bool(jnp.all(jnp.isfinite(g_pos)))


def test_sh_degree0_and_known_directions():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = np.asarray(sh.sh_encode(d, levels=4))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479, atol=1e-6)
    # +z: the l=1 m=0 component is 0.4886*z
    np.testing.assert_allclose(out[0, 2], 0.48860252, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)


def test_sh_rotation_invariant_norm():
    """Per-degree power of the SH vector is rotation invariant."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    R = Rotation.random(random_state=1).as_matrix()
    a = np.asarray(sh.sh_encode(jnp.asarray(v[None]), 4))[0]
    b = np.asarray(sh.sh_encode(jnp.asarray((R @ v)[None]), 4))[0]
    for lo, hi in [(0, 1), (1, 4), (4, 9), (9, 16)]:
        np.testing.assert_allclose(
            np.sum(a[lo:hi] ** 2), np.sum(b[lo:hi] ** 2), atol=1e-5
        )


def test_embeddings_global_vs_per_frame():
    cfg_g = emb_lib.EmbeddingConfig(embedding_type="global_emb", emb_dim=8)
    cfg_e = emb_lib.EmbeddingConfig(embedding_type="evs_emb", emb_dim=8)
    key = jax.random.PRNGKey(0)
    pg = emb_lib.init_embedding(key, cfg_g, num_imgs=10)
    pe = emb_lib.init_embedding(key, cfg_e, num_imgs=10)
    assert pg["table"].shape == (1, 8)
    assert pe["table"].shape == (10, 8)

    ids = jnp.array([0, 3, 7])
    out_g = emb_lib.apply_embedding(pg, cfg_g, ids, train=True)
    assert np.asarray(out_g).std(axis=0).max() < 1e-7  # same row for all ids
    out_e = emb_lib.apply_embedding(pe, cfg_e, ids, train=True)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(pe["table"])[[0, 3, 7]])


def test_embeddings_eval_modes():
    cfg = emb_lib.EmbeddingConfig(embedding_type="evs_emb", emb_dim=8, eval_mode="zero")
    p = emb_lib.init_embedding(jax.random.PRNGKey(0), cfg, num_imgs=30)
    ids = jnp.array([1, 2])
    assert np.abs(np.asarray(emb_lib.apply_embedding(p, cfg, ids, train=False))).max() == 0

    cfg_m = emb_lib.EmbeddingConfig(embedding_type="evs_emb", emb_dim=8, eval_mode="mean")
    out = emb_lib.apply_embedding(p, cfg_m, ids, train=False)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(p["table"]).mean(axis=0), atol=1e-6
    )

    cfg_p = emb_lib.EmbeddingConfig(embedding_type="evs_emb", emb_dim=8, eval_mode="param")
    p2 = emb_lib.init_test_params(p, cfg_p)
    np.testing.assert_allclose(
        np.asarray(p2["test_table"][0]), np.asarray(p["table"][21])
    )
    out = emb_lib.apply_embedding(p2, cfg_p, ids, train=False)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(p2["test_table"][0]))


def test_contraction():
    cfg = field_lib.FieldConfig(use_contraction=True)
    # inside unit ball (L-inf): identity then affine to [0.25, 0.75]
    p = jnp.array([[0.0, 0.0, 0.0], [1.0, -1.0, 0.5]])
    unit, sel = field_lib.contract_positions(p, cfg)
    np.testing.assert_allclose(np.asarray(unit[0]), 0.5, atol=1e-6)
    assert bool(sel[0])
    # far away: contracts toward the [-2,2] shell -> unit stays in (0,1)
    far = jnp.array([[100.0, 0.0, 0.0]])
    unit_f, sel_f = field_lib.contract_positions(far, cfg)
    assert 0.99 < float(unit_f[0, 0]) < 1.0
    assert bool(sel_f[0])


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: field_lib.trunc_exp(x))(jnp.float32(20.0))
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)


def test_field_forward_shapes_and_grads():
    cfg = field_lib.FieldConfig(hash=SMALL_HASH)
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg, num_imgs=5)
    n = 64
    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.8, maxval=0.8)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ids = jnp.zeros((n,), jnp.int32)

    density, rgb = field_lib.field_apply(params, pos, dirs, ids, cfg)
    assert density.shape == (n, 1) and rgb.shape == (n, 3)
    assert float(density.min()) >= 0
    assert 0 <= float(rgb.min()) and float(rgb.max()) <= 1

    def loss(p):
        d, c = field_lib.field_apply(p, pos, dirs, ids, cfg)
        return jnp.mean(d) + jnp.mean(c)

    g = jax.grad(loss)(params)
    for name in ("hash_table", "base_mlp", "color_mlp", "appearance"):
        leaf_max = max(
            float(jnp.abs(x).max()) for x in jax.tree.leaves(g[name])
        )
        assert leaf_max > 0, f"no gradient reaching {name}"


def test_field_density_positions_grad():
    """Pose gradients need d(density)/d(position) (the reference un-no_grads
    sampling for exactly this, lse_grid_estimator.py:13-14)."""
    cfg = field_lib.FieldConfig(hash=SMALL_HASH)
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg)
    pos = jnp.array([[0.1, 0.2, 0.3], [-0.4, 0.0, 0.6]])
    g = jax.grad(lambda p: jnp.sum(field_lib.field_density(params, p, cfg)[0]))(pos)
    assert float(jnp.abs(g).max()) > 0


def test_level_window_slices_compose_to_full_encode():
    """concat(encode[0:C], encode[C:L]) == encode — forward AND both
    gradients — for both table layouts (the invariant the strided
    coarse-level path rests on)."""
    from dataclasses import replace

    for layout in ("blocked", "ngp"):
        cfg = replace(SMALL_HASH, layout=layout, blocked_rows_log2=6)
        tab = he.init_hash_table(jax.random.PRNGKey(0), cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (23, 3))
        full = he.hash_encode(tab, pos, cfg)
        C, F = 2, cfg.features_per_level
        lo_cfg, hi_cfg = replace(cfg, level_hi=C), replace(cfg, level_lo=C)
        part = jnp.concatenate(
            [he.hash_encode(tab, pos, lo_cfg), he.hash_encode(tab, pos, hi_cfg)],
            axis=-1,
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(part), rtol=0, atol=0)

        g = jax.random.normal(jax.random.PRNGKey(2), full.shape)

        def loss_full(t, p):
            return jnp.sum(he.hash_encode(t, p, cfg) * g)

        def loss_part(t, p):
            a = he.hash_encode(t, p, lo_cfg) * g[:, : C * F]
            b = he.hash_encode(t, p, hi_cfg) * g[:, C * F :]
            return jnp.sum(a) + jnp.sum(b)

        gt_f, gp_f = jax.grad(loss_full, argnums=(0, 1))(tab, pos)
        gt_p, gp_p = jax.grad(loss_part, argnums=(0, 1))(tab, pos)
        np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_p), atol=1e-5)


def _ray_structured_inputs(n=4, k=9):
    key = jax.random.PRNGKey(3)
    o = jax.random.uniform(key, (n, 3), minval=-0.2, maxval=0.2)
    d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ts = jnp.cumsum(
        jax.random.uniform(jax.random.PRNGKey(5), (n, k), minval=0.05, maxval=0.2),
        axis=1,
    )
    pos = o[:, None, :] + ts[..., None] * d[:, None, :]
    dirs = jnp.broadcast_to(d[:, None, :], pos.shape).reshape(-1, 3)
    ids = jnp.zeros((n * k,), jnp.int32)
    return pos, ts, dirs, ids


def test_strided_field_stride1_is_exactly_the_plain_path():
    """coarse_stride=1 anchors every sample, so the strided path must equal
    field_apply bit-for-bit (w is 0 or 1 at anchors)."""
    from dataclasses import replace as dc_replace

    cfg = field_lib.FieldConfig(hash=SMALL_HASH, coarse_stride=1, coarse_levels=2)
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg)
    pos, ts, dirs, ids = _ray_structured_inputs()
    d0, c0 = field_lib.field_apply(params, pos.reshape(-1, 3), dirs, ids, cfg)
    d1, c1 = field_lib.field_apply_strided(params, pos, ts, dirs, ids, cfg)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)


def test_strided_field_constant_coarse_rows_exact_any_stride():
    """With every coarse-level table row identical, coarse features are
    position-independent, so lerp between anchors is EXACT at any stride —
    isolates the approximation to exactly the coarse-level variation."""
    cfg = field_lib.FieldConfig(hash=SMALL_HASH, coarse_stride=4, coarse_levels=2)
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg)
    tab = params["hash_table"]
    # blocked table is (rows, Wrow) f32; ngp is (F, L*T). SMALL_HASH default
    # layout is ngp: flatten-constant the first coarse_levels levels
    L, T = cfg.hash.num_levels, cfg.hash.table_size
    tabc = tab.at[:, : 2 * T].set(0.125)
    params = dict(params, hash_table=tabc)
    pos, ts, dirs, ids = _ray_structured_inputs()
    d0, c0 = field_lib.field_apply(params, pos.reshape(-1, 3), dirs, ids, cfg)
    d1, c1 = field_lib.field_apply_strided(params, pos, ts, dirs, ids, cfg)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-5)


def test_strided_field_grads_reach_all_params():
    cfg = field_lib.FieldConfig(hash=SMALL_HASH, coarse_stride=3, coarse_levels=2)
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg)
    pos, ts, dirs, ids = _ray_structured_inputs()

    def loss(p, q):
        d, c = field_lib.field_apply_strided(p, q, ts, dirs, ids, cfg)
        return jnp.mean(d) + jnp.mean(c)

    gp, gpos = jax.grad(loss, argnums=(0, 1))(params, pos)
    for name in ("hash_table", "base_mlp", "color_mlp"):
        leaf_max = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(gp[name]))
        assert leaf_max > 0, f"no gradient reaching {name}"
    assert float(jnp.abs(gpos).max()) > 0
    assert bool(jnp.all(jnp.isfinite(gpos)))


def test_strided_config_validation():
    """ADVICE r4: coarse_levels must sit strictly inside the level ladder
    when striding is on (0 collides with the level_hi=0 'all levels'
    sentinel; >=num_levels leaves the fine encode empty)."""
    import pytest

    for bad in (0, SMALL_HASH.num_levels, SMALL_HASH.num_levels + 1):
        with pytest.raises(ValueError, match="coarse_levels"):
            field_lib.FieldConfig(
                hash=SMALL_HASH, coarse_stride=2, coarse_levels=bad
            )
    # stride 1 (off): any coarse_levels value is inert and allowed
    field_lib.FieldConfig(hash=SMALL_HASH, coarse_stride=1, coarse_levels=0)


def test_compact_chunk_excludes_coarse_stride():
    """ADVICE r4: compact_chunk would silently win over coarse_stride>1
    (sample compaction destroys the ray structure the lerp needs)."""
    import pytest

    from lsenerf_tpu.models import lsenerf as model_lib

    with pytest.raises(ValueError, match="mutually"):
        model_lib.ModelConfig(
            field=field_lib.FieldConfig(
                hash=SMALL_HASH, coarse_stride=2, coarse_levels=2
            ),
            compact_chunk=4096,
        )


def test_strided_oob_anchor_does_not_contaminate_valid_samples():
    """ADVICE r4: in aabb mode an out-of-bounds anchor is hash-encoded at
    the zeroed cube corner; its features must NOT lerp into neighboring
    in-bounds samples — the weight snaps to the valid anchor instead."""
    cfg = field_lib.FieldConfig(
        hash=SMALL_HASH, coarse_stride=4, coarse_levels=2,
        use_contraction=False, aabb_scale=1.0,
    )
    params = field_lib.init_field(jax.random.PRNGKey(0), cfg)

    # one ray marching out of the box along +x: k=9, stride 4 -> anchors at
    # samples {0, 4, 8}; samples 0..7 (x in [-0.5, 0.9]) are inside the
    # [-1, 1] box, sample/anchor 8 (x=1.1) is OOB — so sample 5's right
    # anchor is OOB while sample 5 itself is valid.
    k = 9
    xs = jnp.linspace(-0.5, 1.1, k)  # box is [-1, 1]
    pos = jnp.stack([xs, jnp.zeros(k), jnp.zeros(k)], axis=-1)[None]
    ts = xs[None] + 1.0
    dirs = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (k, 1))
    ids = jnp.zeros((k,), jnp.int32)

    unit, selector = field_lib.contract_positions(pos.reshape(-1, 3), cfg)
    sel = np.asarray(selector).reshape(1, k)
    assert sel[0, 5] and not sel[0, 8], "test geometry must straddle the box"

    feats = field_lib._strided_encode(
        params, unit.reshape(1, k, 3), ts, cfg, selector=selector
    )
    C_F = cfg.coarse_levels * cfg.hash.features_per_level
    # snapped weight => sample 5's coarse features == anchor-4's exactly
    np.testing.assert_allclose(
        np.asarray(feats[5, :C_F]), np.asarray(feats[4, :C_F]), atol=1e-7
    )
