"""Probe 2: exact dynamic_gather formulation + throughput on this chip."""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def check(name, fn, want, *args):
    t0 = time.time()
    try:
        out = np.asarray(jax.jit(fn)(*args))
        ok = np.allclose(out, want, atol=1e-6)
        print(f"{name}: {'OK' if ok else 'WRONG'} ({time.time()-t0:.1f}s)",
              flush=True)
        return ok
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"{name}: FAIL ({time.time()-t0:.1f}s) {msg}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


# --- E2: take_along_axis with precomputed 2D indices, W=128
T, W = 2048, 128
t_np = rng.standard_normal((T, W), dtype=np.float32)
i_np = rng.integers(0, T, T).astype(np.int32)
i2d = np.broadcast_to(i_np[:, None], (T, W)).copy()
want = t_np[i_np]


def k_tala(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


check(
    "E2 tala 2d-idx W=128",
    lambda t, i: pl.pallas_call(
        k_tala, out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32)
    )(t, i),
    want, jnp.asarray(t_np), jnp.asarray(i2d),
)

# --- E3: W=64 (sub-lane-width rows)
T3, W3 = 2048, 64
t3_np = rng.standard_normal((T3, W3), dtype=np.float32)
i3_np = rng.integers(0, T3, T3).astype(np.int32)
i3_2d = np.broadcast_to(i3_np[:, None], (T3, W3)).copy()


def k_tala3(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


check(
    "E3 tala 2d-idx W=64",
    lambda t, i: pl.pallas_call(
        k_tala3, out_shape=jax.ShapeDtypeStruct((T3, W3), jnp.float32)
    )(t, i),
    t3_np[i3_np], jnp.asarray(t3_np), jnp.asarray(i3_2d),
)


# --- F: broadcast (T,1) idx inside kernel
def k_bc(t_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[...], (T, W))
    o_ref[...] = jnp.take_along_axis(t_ref[...], idx, axis=0)


check(
    "F in-kernel bcast (T,1)",
    lambda t, i: pl.pallas_call(
        k_bc, out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32)
    )(t, i),
    want, jnp.asarray(t_np), jnp.asarray(i_np[:, None]),
)

# --- G: bf16 table
tb_np = t_np.astype(jnp.bfloat16)


def k_bf16(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


check(
    "G tala bf16",
    lambda t, i: pl.pallas_call(
        k_bf16, out_shape=jax.ShapeDtypeStruct((T, W), jnp.bfloat16)
    )(t, i),
    np.asarray(tb_np)[i_np], jnp.asarray(tb_np), jnp.asarray(i2d),
)

# --- H: throughput: large operand, many chained gathers
TH, WH, REPS = 8192, 128, 64
th_np = rng.standard_normal((TH, WH), dtype=np.float32)
ih_np = rng.integers(0, TH, (REPS, TH)).astype(np.int32)


def k_tput(t_ref, i_ref, o_ref):
    def body(r, acc):
        idx = jax.lax.broadcasted_iota(jnp.int32, (TH, WH), 0) * 0 + i_ref[r][:, None]
        return acc + jnp.take_along_axis(t_ref[...], idx, axis=0)

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((TH, WH), jnp.float32))


def run_tput(t, i):
    return pl.pallas_call(
        k_tput, out_shape=jax.ShapeDtypeStruct((TH, WH), jnp.float32)
    )(t, i)


try:
    f = jax.jit(run_tput)
    out = np.asarray(f(jnp.asarray(th_np), jnp.asarray(ih_np)))
    want_h = th_np[ih_np[0]] * 0
    for r in range(REPS):
        want_h = want_h + th_np[ih_np[r]]
    ok = np.allclose(out, want_h, rtol=1e-4)
    t_arr, i_arr = jnp.asarray(th_np), jnp.asarray(ih_np)
    jax.block_until_ready(f(t_arr, i_arr))
    t0 = time.time()
    N_CALLS = 20
    for _ in range(N_CALLS):
        out = f(t_arr, i_arr)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N_CALLS
    rows = REPS * TH
    print(
        f"H throughput: {'OK' if ok else 'WRONG'} {dt*1e3:.2f} ms/call "
        f"= {rows/dt/1e9:.2f} G rows/s ({rows} rows x {WH} lanes)",
        flush=True,
    )
except Exception as e:
    print(f"H throughput: FAIL {str(e).splitlines()[0][:160]}", flush=True)
    if "-v" in sys.argv:
        traceback.print_exc()
