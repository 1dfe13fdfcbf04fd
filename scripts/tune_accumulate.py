"""Tune the factored windowed accumulate on the real chip.

Measures: lax.sort cost vs payload operand count/dtype, and the factored
accumulate end-to-end across (window, batch_windows) and packed vs unpacked
bf16 payloads.
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

M = 3512 * 48 * 16  # flagship update count
T = 199494  # flagship blocked table rows
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, T, M), jnp.int32)


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)


# --- sort scaling with operands
f32 = jnp.asarray(rng.random(M), jnp.float32)
bf = f32.astype(jnp.bfloat16)
u32 = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)

timeit("sort 1key", jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0]), keys)
timeit(
    "sort 1key+2u32",
    jax.jit(lambda k, a: jax.lax.sort([k, a, a], num_keys=1)[0]),
    keys, u32,
)
timeit(
    "sort 1key+3u32",
    jax.jit(lambda k, a: jax.lax.sort([k, a, a, a], num_keys=1)[0]),
    keys, u32,
)
timeit(
    "sort 1key+5u32",
    jax.jit(lambda k, a: jax.lax.sort([k] + [a] * 5, num_keys=1)[0]),
    keys, u32,
)
timeit(
    "sort 1key+5bf16",
    jax.jit(lambda k, a: jax.lax.sort([k] + [a] * 5, num_keys=1)[0]),
    keys, bf,
)

# --- factored accumulate variants
from lsenerf_tpu.ops.fast_gather import (  # noqa: E402
    sorted_window_accumulate_factored,
)

F = 2
Wrow = 64
fac_bf = tuple([bf] * 5)


def mk_make_rows(u_count=5):
    def make_rows(seg):
        gf = jnp.stack([seg[0].astype(jnp.float32),
                        seg[1].astype(jnp.float32)], axis=1)

        def dec(e):
            e = e.astype(jnp.float32)
            o = (e < 0).astype(jnp.float32)
            w = jnp.where(e < 0, -e - 1.0, e)
            return o, w

        us = []
        for i in (2, 3, 4):
            o, w = dec(seg[i])
            us.append(
                jnp.stack(
                    [(1 - w) * (1 - o), w * (1 - o) + (1 - w) * o, w * o],
                    axis=1,
                )
            )
        w27 = (
            us[0][:, :, None, None] * us[1][:, None, :, None]
            * us[2][:, None, None, :]
        ).reshape(-1, 27)
        rows = (w27[:, :, None] * gf[:, None, :]).reshape(-1, 54)
        return jnp.pad(rows, ((0, 0), (0, Wrow - 54))).astype(jnp.bfloat16)

    return make_rows


for window, bw in [(128, 8), (128, 32), (256, 8), (256, 32), (512, 16)]:
    fn = jax.jit(
        lambda k, f, window=window, bw=bw: sorted_window_accumulate_factored(
            k, f, mk_make_rows(), Wrow, T, jnp.float32,
            window=window, batch_windows=bw,
        )
    )
    timeit(f"accum w={window} bw={bw}", fn, keys, fac_bf)
