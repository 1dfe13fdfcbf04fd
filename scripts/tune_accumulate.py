"""Tune the factored windowed accumulate on the real chip.

Measures (via utils.timing.device_time — see its docstring for why naive
fixed-input reps read ~0 ms through the tunnel's dispatch cache):
  - lax.sort cost vs payload operand count/dtype at flagship update count;
  - the factored accumulate end-to-end across (window, batch_windows,
    max_updates_factor).
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.timing import device_time  # noqa: E402
from lsenerf_tpu.utils.tpu_retry import warmup  # noqa: E402

warmup()

M = 3512 * 48 * 13  # flagship HASHED-level update count (dense prefix bypasses)
T = 205869  # flagship hashed-level rows (total minus 5218-row dense prefix)
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, T, M), jnp.int32)


def perturb_keys(args, salt):
    k = args[0]
    return ((k + salt) % jnp.int32(T),) + tuple(args[1:])


def report(name, fn, args, iters=6):
    dt = device_time(fn, args, perturb_keys, iters=iters, calls=3)
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


# --- sort scaling with operands
f32 = jnp.asarray(rng.random(M), jnp.float32)
bf = f32.astype(jnp.bfloat16)
u32 = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)

report("sort 1key", lambda k: jax.lax.sort([k], num_keys=1)[0], (keys,))
report(
    "sort 1key+2i32",
    lambda k, a: jax.lax.sort([k, a, a], num_keys=1)[0], (keys, u32),
)
report(
    "sort 1key+3i32",
    lambda k, a: jax.lax.sort([k, a, a, a], num_keys=1)[0], (keys, u32),
)
report(
    "sort 1key+5i32",
    lambda k, a: jax.lax.sort([k] + [a] * 5, num_keys=1)[0], (keys, u32),
)
report(
    "sort 1key+5bf16",
    lambda k, a: jax.lax.sort([k] + [a] * 5, num_keys=1)[0], (keys, bf),
)
report(
    "sort 1key+5f32",
    lambda k, a: jax.lax.sort([k] + [a] * 5, num_keys=1)[0], (keys, f32),
)

# --- factored accumulate variants
from lsenerf_tpu.ops.fast_gather import (  # noqa: E402
    sorted_window_accumulate_factored,
)

F = 2
Wrow = 64
fac_bf = tuple([bf] * 5)


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


for window, bw, muf in [
    (512, 32, 3), (256, 32, 3), (256, 64, 3), (384, 32, 3), (512, 64, 3),
    (768, 32, 3), (512, 32, 2),
]:
    def fn(k, *f, window=window, bw=bw, muf=muf):
        return sorted_window_accumulate_factored(
            k, tuple(f), make_rows, Wrow, T, jnp.float32,
            window=window, batch_windows=bw, max_updates_factor=muf,
        )

    report(f"accum w={window} bw={bw} muf={muf}", fn, (keys,) + fac_bf, iters=4)
