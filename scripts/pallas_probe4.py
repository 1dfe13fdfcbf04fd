"""Probe 4: throughput of the SMEM-indexed VMEM row-gather at scale.

Probe 3 established the viable Mosaic vocabulary on this chip: fori_loop of
dynamic row slices with indices in SMEM (S1). This measures whether that
formulation beats XLA's HBM gather (~10 ns/row, 26 ms for the flagship's
2.7M rows) when the table is VMEM-resident.

Timing via utils.timing.device_time (the tunnel dedupes value-identical
dispatches; fixed-input timeit reads ~0 ms).
"""

import functools
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from lsenerf_tpu.utils.timing import device_time  # noqa: E402
from lsenerf_tpu.utils.tpu_retry import warmup  # noqa: E402

warmup()

rng = np.random.default_rng(0)


def gather_kernel(i_ref, t_ref, o_ref, *, chunk, unroll):
    def body(k, _):
        base = k * unroll
        if unroll == 1:
            o_ref[pl.ds(base, 1), :] = t_ref[pl.ds(i_ref[base], 1), :]
        else:
            rows = [
                t_ref[pl.ds(i_ref[base + u], 1), :] for u in range(unroll)
            ]
            o_ref[pl.ds(base, unroll), :] = jnp.concatenate(rows, axis=0)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def make_gather(T, W, m, chunk, unroll, dtype):
    grid = m // chunk

    @jax.jit
    def f(idx, table):
        return pl.pallas_call(
            functools.partial(gather_kernel, chunk=chunk, unroll=unroll),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, W), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, W), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, W), dtype),
        )(idx, table)

    return f


def bench(name, T, W, m, chunk, unroll, np_dtype, iters=4):
    table = jnp.asarray(
        rng.standard_normal((T, W)).astype(np.float32), np_dtype
    )
    idx = jnp.asarray(rng.integers(0, T, m), jnp.int32)
    fn = make_gather(T, W, m, chunk, unroll, np_dtype)

    # correctness first (on a prefix)
    try:
        out = fn(idx, table)
        got = np.asarray(out[:1024], np.float32)
        want = np.asarray(table, np.float32)[np.asarray(idx[:1024])]
        ok = np.allclose(got, want, atol=1e-2)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:140]}", flush=True)
        return

    def perturb(a, salt):
        return ((a[0] + salt) % jnp.int32(T), a[1])

    dt = device_time(fn, (idx, table), perturb, iters=iters, calls=3)
    ns_row = dt / m * 1e9
    print(
        f"{name}: {'OK' if ok else 'WRONG'} {dt*1e3:.1f} ms "
        f"({ns_row:.1f} ns/row)",
        flush=True,
    )


M = 3512 * 48 * 16  # flagship row-gather count (2.7M)

# chunk=2048 keys -> 8 KB of SMEM per program (SMEM is small); m divisible
# small table first (cheap compiles), then flagship scale
bench("A 16k x 64 f32 u1", 16384, 64, 2**20, 2048, 1, np.float32)
bench("B 16k x 64 f32 u8", 16384, 64, 2**20, 2048, 8, np.float32)
bench("C flagship 200k x 64 bf16 u1", 199680, 64, M, 2048, 1, jnp.bfloat16)
bench("D flagship 200k x 64 bf16 u8", 199680, 64, M, 2048, 8, jnp.bfloat16)
