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
