"""Probe: compile/runtime of the per-level dense one-hot accumulate at
flagship shapes (n=168k samples onto rl rows), unchunked vs lax.map-chunked.

Motivation: routing the 9261-row res-42 level through the exact one-hot
gradient (ADVICE r2) wedged the train-step compile — suspicion is the
(168k x 9261) one-hot operand. This isolates it per rl.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.utils.tpu_retry import warmup

warmup()
print("warm", flush=True)

N = 168576  # flagship samples per step (3512 rays x 48)
W = 64


def unchunked(keys, rows, rl):
    onehot = (
        keys[:, None] == jnp.arange(rl, dtype=jnp.int32)[None, :]
    ).astype(rows.dtype)
    return jax.lax.dot_general(
        onehot, rows, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def chunked(keys, rows, rl, n_chunks=16):
    ks = keys.reshape(n_chunks, -1)
    rs = rows.reshape(n_chunks, -1, W)

    def body(acc, kr):
        k, r = kr
        onehot = (
            k[:, None] == jnp.arange(rl, dtype=jnp.int32)[None, :]
        ).astype(r.dtype)
        return acc + jax.lax.dot_general(
            onehot, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), None

    return jax.lax.scan(body, jnp.zeros((rl, W), jnp.float32), (ks, rs))[0]


rng = np.random.default_rng(0)
rows = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32)).astype(jnp.bfloat16)

for rl in [512, 1331, 3375, 9261]:
    keys = jnp.asarray(rng.integers(0, rl, N).astype(np.int32))
    for name, fn in (("unchunked", unchunked), ("chunked16", chunked)):
        try:
            f = jax.jit(lambda k, r, fn=fn, rl=rl: fn(k, r, rl))
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(keys, rows))
            t_compile = time.perf_counter() - t0
            # honest timing: perturb input each iter to beat dispatch dedup
            t0 = time.perf_counter()
            for i in range(5):
                out = f(keys + (i % 2), rows)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5 * 1000
            print(f"rl={rl:5d} {name:10s}: compile {t_compile:6.1f}s, "
                  f"{dt:7.2f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"rl={rl:5d} {name:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
