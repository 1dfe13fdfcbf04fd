"""Correctness tests for the scatter-free gather backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsenerf_tpu.ops import fast_gather as fg


def test_sorted_window_accumulate_matches_scatter():
    rng = np.random.default_rng(0)
    LT, m, F = 2048, 6000, 2
    idx = jnp.asarray(rng.integers(0, LT, m), jnp.int32)
    g = jnp.asarray(rng.normal(size=(m, F)).astype(np.float32))
    got = fg.sorted_window_accumulate(idx, g, LT, window=128)
    want = np.zeros((LT, F), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(g))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_sorted_window_accumulate_odd_sizes():
    rng = np.random.default_rng(1)
    LT, m, F = 777, 1000, 3
    idx = jnp.asarray(rng.integers(0, LT, m), jnp.int32)
    g = jnp.asarray(rng.normal(size=(m, F)).astype(np.float32))
    got = fg.sorted_window_accumulate(idx, g, LT, window=256, batch_windows=3)
    want = np.zeros((LT, F), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(g))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_take_cols_grad_matches_autodiff(monkeypatch):
    monkeypatch.setattr(fg, "_use_windowed_bwd", lambda n: True)
    rng = np.random.default_rng(2)
    F, LT, m = 2, 1024, 4096
    table = jnp.asarray(rng.normal(size=(F, LT)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, LT, m), jnp.int32)
    w = jnp.asarray(rng.normal(size=(F, m)).astype(np.float32))

    def loss_fast(t):
        return jnp.sum(fg.take_cols(t, idx) * w)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, idx, axis=1) * w)

    g_fast = jax.grad(loss_fast)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-3)


def test_take_cols_grad_heavy_duplicates(monkeypatch):
    """Many duplicates of one index within a window still sum exactly
    (forcing the windowed path, which is normally TPU-only)."""
    monkeypatch.setattr(fg, "_use_windowed_bwd", lambda n: True)
    F, LT = 2, 512
    idx = jnp.asarray([7] * 300 + [100] * 200 + [511] * 12, jnp.int32)
    g = jnp.ones((F, len(idx)))
    table = jnp.zeros((F, LT))
    grad = jax.grad(lambda t: jnp.sum(fg.take_cols(t, idx) * g))(table)
    np.testing.assert_allclose(np.asarray(grad[:, 7]), 300.0)
    np.testing.assert_allclose(np.asarray(grad[:, 100]), 200.0)
    np.testing.assert_allclose(np.asarray(grad[:, 511]), 12.0)


def test_take_rows_grad():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, 256), jnp.int32)
    g_fast = jax.grad(lambda t: jnp.sum(fg.take_rows(t, idx) ** 2))(table)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) ** 2))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-4)


def test_factored_accumulate_presorted_segments_equiv():
    """presorted_segments: per-segment batched sorts concatenated must equal
    the global sort when segments are range-partitioned (the blocked
    hash layout's level-major keys) — identical accumulated tables."""
    rng = np.random.default_rng(11)
    segments, per_seg, table_len, Wrow = 4, 1024, 4096, 8
    # segment s draws keys only from [s*1024, (s+1)*1024)
    idx = np.concatenate([
        rng.integers(s * 1024, (s + 1) * 1024, per_seg) for s in range(segments)
    ]).astype(np.int32)
    a = rng.normal(size=idx.shape).astype(np.float32)
    b = rng.normal(size=idx.shape).astype(np.float32)

    def make_rows(fs):
        fa, fb = fs
        return (fa[:, None] * fb[:, None]) * jnp.ones((1, Wrow), jnp.float32)

    kw = dict(row_width=Wrow, table_len=table_len, out_dtype=jnp.float32,
              window=128, max_updates_factor=6, batch_windows=4)
    out_global = fg.sorted_window_accumulate_factored(
        jnp.asarray(idx), (jnp.asarray(a), jnp.asarray(b)), make_rows, **kw)
    out_seg = fg.sorted_window_accumulate_factored(
        jnp.asarray(idx), (jnp.asarray(a), jnp.asarray(b)), make_rows,
        presorted_segments=segments, **kw)
    np.testing.assert_allclose(
        np.asarray(out_seg), np.asarray(out_global), rtol=1e-5, atol=1e-5)
