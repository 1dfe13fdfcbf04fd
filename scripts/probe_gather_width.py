"""XLA HBM row-gather cost vs row width and count (honest timing).

Decides whether the paired-level blocked layout (half the rows, 2.5-5x the
row width) wins: it only does if the per-row gather cost stays roughly flat
with width.
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

rng = np.random.default_rng(0)
M_FULL = 3512 * 48 * 16  # 2.7M
M_HALF = M_FULL // 2


def bench(name, T, W, m, dtype, iters=6):
    table = jnp.asarray(rng.standard_normal((T, W)).astype(np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, T, m), jnp.int32)

    def fn(i, t):
        return jnp.take(t, i, axis=0)

    def perturb(a, salt):
        return ((a[0] + salt) % jnp.int32(T), a[1])

    dt = device_time(fn, (idx, table), perturb, iters=iters, calls=3)
    print(f"{name}: {dt*1e3:.1f} ms ({dt/m*1e9:.1f} ns/row)", flush=True)


# width sweep at half count (the paired-layout regime), bf16
for W in (64, 128, 256, 320, 512):
    bench(f"bf16 W={W} m=1.35M", 99840, W, M_HALF, jnp.bfloat16)

# full-count reference points
bench("bf16 W=64 m=2.7M (current fwd)", 199680, 64, M_FULL, jnp.bfloat16)
bench("f32  W=64 m=2.7M", 199680, 64, M_FULL, jnp.float32)
