"""Probe which in-kernel gather formulations Mosaic supports on this chip.

Run on the real TPU: python scripts/pallas_probe.py
Each probe compiles a tiny kernel and checks numerics vs numpy.
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, W, C = 2048, 64, 512
rng = np.random.default_rng(0)
table_np = rng.standard_normal((T, W), dtype=np.float32)
idx_np = rng.integers(0, T, C).astype(np.int32)
want = table_np[idx_np]

table = jnp.asarray(table_np)
idx = jnp.asarray(idx_np)


def check(name, fn):
    t0 = time.time()
    try:
        out = np.asarray(jax.jit(fn)(table, idx))
        ok = np.allclose(out, want, atol=1e-6)
        print(f"{name}: {'OK' if ok else 'WRONG'} ({time.time()-t0:.1f}s)",
              flush=True)
        return ok
    except Exception as e:
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"{name}: FAIL ({time.time()-t0:.1f}s) {msg}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


# A: jnp.take(table, idx, axis=0) inside kernel
def kernel_take(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)


check(
    "A take(axis=0)",
    lambda t, i: pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32),
    )(t, i),
)


# B: take_along_axis with broadcast 2D indices
def kernel_tala(t_ref, i_ref, o_ref):
    idx2 = jnp.broadcast_to(i_ref[...][:, None], (C, W))
    o_ref[...] = jnp.take_along_axis(t_ref[...], idx2, axis=0)


check(
    "B take_along_axis bcast",
    lambda t, i: pl.pallas_call(
        kernel_tala,
        out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32),
    )(t, i),
)


# C: fori_loop of dynamic row slices
def kernel_loop(t_ref, i_ref, o_ref):
    def body(k, _):
        o_ref[pl.ds(k, 1), :] = t_ref[pl.ds(i_ref[k], 1), :]
        return 0

    jax.lax.fori_loop(0, C, body, 0)


check(
    "C fori dynamic-slice rows",
    lambda t, i: pl.pallas_call(
        kernel_loop,
        out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32),
    )(t, i),
)


# D: one-hot matmul gather (known-good, MXU)
def kernel_onehot(t_ref, i_ref, o_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, T), 1)
    oh = (lanes == i_ref[...][:, None]).astype(jnp.float32)
    o_ref[...] = jnp.dot(oh, t_ref[...], preferred_element_type=jnp.float32)


check(
    "D one-hot matmul",
    lambda t, i: pl.pallas_call(
        kernel_onehot,
        out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32),
    )(t, i),
)


# E: take_along_axis elementwise (dynamic_gather native form):
# out[i, j] = table[idx2[i, j], j] with idx2 same shape as table
def kernel_dg(t_ref, i_ref, o_ref):
    full = jnp.broadcast_to(i_ref[...][:, None], (T, W))
    o_ref[...] = jnp.take_along_axis(t_ref[...], full, axis=0)


def run_e(t, i):
    ipad = jnp.zeros((T,), jnp.int32).at[:C].set(i)
    out = pl.pallas_call(
        kernel_dg,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
    )(t, ipad)
    return out[:C]


check("E full-height dynamic_gather", run_e)
