"""Sanity-probe the timing methodology on the tunneled chip.

tune_accumulate measured 0.1 ms for a 2.7M-key sort — below the ~20 ms
tunnel RTT, so something is short-circuiting. Compare: fixed input reps,
fresh input reps, and host-materialized outputs.
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
rng = np.random.default_rng(0)

sort1 = jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0])

keys = jnp.asarray(rng.integers(0, 199494, M), jnp.int32)
out = sort1(keys)
jax.block_until_ready(out)

# A: fixed input, block_until_ready
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = sort1(keys)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
print(f"A fixed+block: {[f'{t*1e3:.1f}' for t in ts]} ms", flush=True)

# B: fixed input, materialize to host
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = sort1(keys)
    _ = np.asarray(out[:8])
    ts.append(time.perf_counter() - t0)
print(f"B fixed+host: {[f'{t*1e3:.1f}' for t in ts]} ms", flush=True)

# C: fresh input each rep (device-side perturb to avoid H2D cost)
ts = []
k = keys
for i in range(5):
    k = (k + jnp.int32(i + 1)) % jnp.int32(199494)
    jax.block_until_ready(k)
    t0 = time.perf_counter()
    out = sort1(k)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
print(f"C fresh+block: {[f'{t*1e3:.1f}' for t in ts]} ms", flush=True)

# D: chained dependency (output feeds next input)
ts = []
k = keys
for _ in range(5):
    t0 = time.perf_counter()
    k = sort1((k + 1) % jnp.int32(199494))
    jax.block_until_ready(k)
    ts.append(time.perf_counter() - t0)
print(f"D chained: {[f'{t*1e3:.1f}' for t in ts]} ms", flush=True)
