"""Probe 2: does block_until_ready on a small output actually wait (axon)?

Compares a fori_loop-of-sort reduced to a scalar vs returning the full
array, and np.asarray materialization of the scalar.
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup  # noqa: E402

warmup()

M = 3512 * 48 * 16
T = 199494
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, T, M), jnp.int32)
ITERS = 4


@jax.jit
def run_scalar(salt, k):
    def body(i, acc):
        ki = (k + salt + i) % jnp.int32(T)
        s = jax.lax.sort([ki], num_keys=1)[0]
        return acc + jnp.sum(s.astype(jnp.float32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


@jax.jit
def run_array(salt, k):
    def body(i, s):
        ki = (s + salt + i) % jnp.int32(T)
        return jax.lax.sort([ki], num_keys=1)[0]

    return jax.lax.fori_loop(0, ITERS, body, k)


jax.block_until_ready(run_scalar(np.int32(1), keys))
jax.block_until_ready(run_array(np.int32(1), keys))

for name, fn in [("scalar", run_scalar), ("array", run_array)]:
    for mode in ["block", "host"]:
        ts = []
        for c in range(3):
            s = np.int32(100 + c * ITERS + (0 if mode == "block" else 50))
            t0 = time.perf_counter()
            out = fn(s, keys)
            if mode == "block":
                jax.block_until_ready(out)
            else:
                _ = np.asarray(out if name == "scalar" else out[:1])
            ts.append(time.perf_counter() - t0)
        per = np.median(ts) / ITERS
        print(f"{name}/{mode}: {per*1e3:.1f} ms/iter "
              f"(calls: {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
