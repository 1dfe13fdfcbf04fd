"""Probe 3: pin down what breaks Mosaic on this chip.

Minimal dynamic_gather cases (both dims), SMEM-indexed loop gather, and
dynamic VMEM slicing — to decide the viable kernel vocabulary.
"""

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
        msg = str(e).splitlines()[0][:140] if str(e) else type(e).__name__
        print(f"{name}: FAIL ({time.time()-t0:.1f}s) {msg}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


# M1: minimal (8,128) dims=0 gather
t8 = rng.standard_normal((8, 128), dtype=np.float32)
i8 = rng.integers(0, 8, (8, 128)).astype(np.int32)


def k_m1(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


check(
    "M1 (8,128) dims0",
    lambda t, i: pl.pallas_call(
        k_m1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, i),
    np.take_along_axis(t8, i8, axis=0), jnp.asarray(t8), jnp.asarray(i8),
)

# M2: minimal (8,128) dims=1 gather (lane gather)
i8l = rng.integers(0, 128, (8, 128)).astype(np.int32)


def k_m2(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)


check(
    "M2 (8,128) dims1",
    lambda t, i: pl.pallas_call(
        k_m2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, i),
    np.take_along_axis(t8, i8l, axis=1), jnp.asarray(t8), jnp.asarray(i8l),
)

# M3: (1024,128) dims=1 gather within rows of 128 lanes
t1k = rng.standard_normal((1024, 128), dtype=np.float32)
i1k = rng.integers(0, 128, (1024, 128)).astype(np.int32)


def k_m3(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)


check(
    "M3 (1024,128) dims1",
    lambda t, i: pl.pallas_call(
        k_m3, out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32)
    )(t, i),
    np.take_along_axis(t1k, i1k, axis=1), jnp.asarray(t1k), jnp.asarray(i1k),
)

# S1: SMEM-indexed fori loop of row slices
TS, WS, CS = 512, 128, 64
ts_ = rng.standard_normal((TS, WS), dtype=np.float32)
is_ = rng.integers(0, TS, CS).astype(np.int32)


def k_s1(i_ref, t_ref, o_ref):
    def body(k, _):
        o_ref[pl.ds(k, 1), :] = t_ref[pl.ds(i_ref[k], 1), :]
        return 0

    jax.lax.fori_loop(0, CS, body, 0)


check(
    "S1 SMEM-idx loop rows",
    lambda t, i: pl.pallas_call(
        k_s1,
        out_shape=jax.ShapeDtypeStruct((CS, WS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t),
    ts_[is_], jnp.asarray(ts_), jnp.asarray(is_),
)


# S2: dynamic-slice read at traced offset (no per-element indices)
def k_s2(i_ref, t_ref, o_ref):
    start = i_ref[0]
    o_ref[...] = t_ref[pl.ds(start, CS), :]


check(
    "S2 dynamic block slice",
    lambda t, i: pl.pallas_call(
        k_s2,
        out_shape=jax.ShapeDtypeStruct((CS, WS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([17], jnp.int32), t),
    ts_[17 : 17 + CS], jnp.asarray(ts_), None,
)

# R1: pltpu.roll with static shift (used for lane-half select)
def k_r1(t_ref, o_ref):
    o_ref[...] = pltpu.roll(t_ref[...], shift=64, axis=1)


check(
    "R1 static roll lanes",
    lambda t, i: pl.pallas_call(
        k_r1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t),
    np.roll(t8, 64, axis=1), jnp.asarray(t8), None,
)
