"""Sub-stage costs of the blocked hash encode forward (flagship shapes).

hash_fwd measures 26.3 ms but the raw row gather alone is ~12 ms
(probe_gather_width) — this isolates keys/fracs math, the gather, and the
trilinear combine to find where the other ~14 ms goes.
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

from lsenerf_tpu.ops import hash_encoding as he  # noqa: E402

cfg = he.HashEncodingConfig(layout="blocked", gather_dtype="bfloat16")
n = 3512 * 48
L = cfg.num_levels
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.random((n, 3), np.float32))
table = he.init_hash_table(jax.random.PRNGKey(0), cfg)
T = table.shape[0]


def perturb_pos(a, salt):
    out = list(a)
    for i, x in enumerate(a):
        if x.dtype == jnp.float32 and x.ndim == 2 and x.shape[-1] == 3:
            out[i] = (x + salt.astype(jnp.float32) * 1e-6) % 1.0
    return tuple(out)


def report(name, fn, args, perturb, iters=6):
    dt = device_time(fn, args, perturb, iters=iters, calls=3)
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)


# 1. keys + fracs only
report(
    "keys_fracs",
    lambda p: he._blocked_keys_fracs(p, cfg),
    (pos,), perturb_pos,
)

# 2. gather only (keys precomputed)
keys, _, _, _ = jax.jit(lambda p: he._blocked_keys_fracs(p, cfg))(pos)
kflat = keys.reshape(-1)
report(
    "gather_only",
    lambda k, t: jnp.take(t.astype(jnp.bfloat16), k, axis=0),
    (kflat, table),
    lambda a, salt: ((a[0] + salt) % jnp.int32(T), a[1]),
)

# 3. combine only (rows + fracs precomputed)
rows = jnp.take(table.astype(jnp.bfloat16), kflat, axis=0)
fr = jax.jit(lambda p: he._blocked_keys_fracs(p, cfg))(pos)
_, (ox, wx), (oy, wy), (oz, wz) = fr


def combine(rows_, wx_, wy_, wz_):
    return he._blocked_combine(
        rows_, ox, wx_, oy, wy_, oz, wz_, n, cfg
    )


def perturb_w(a, salt):
    s = salt.astype(jnp.float32) * 1e-6
    return (a[0], (a[1] + s) % 1.0, (a[2] + s) % 1.0, (a[3] + s) % 1.0)


report("combine_only", combine, (rows, wx, wy, wz), perturb_w)

# 4. whole forward (reference point)
report(
    "encode_full",
    lambda t, p: he.hash_encode(t, p, cfg),
    (table, pos), lambda a, salt: (a[0], (a[1] + salt.astype(jnp.float32) * 1e-6) % 1.0),
)
