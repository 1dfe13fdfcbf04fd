"""Measure per-level block-key duplication along rays (flagship config).

Motivation: the blocked hash encode gathers one row per (sample, level) —
2.7M rows/step. Samples are ordered along each ray, and at coarse levels
consecutive samples often land in the SAME 3x3x3 block (the contraction
compresses far samples further). If the average run length is high, a
static-shape run-length dedup (one-hot compact + reconstruct matmuls) cuts
both the forward gather rows and the backward accumulate updates.

Prints, per level: mean/p95 distinct keys per ray (out of max_samples), and
the total distinct fraction — measured on a real batch after warming the
occupancy grid toward steady state (sample placement differs a lot between
a fresh dense grid and a converged one).
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

warmup()

from __graft_entry__ import _flagship  # noqa: E402
from lsenerf_tpu.cameras import cameras as cam_lib  # noqa: E402
from lsenerf_tpu.models import field as field_lib  # noqa: E402
from lsenerf_tpu.ops import hash_encoding as he  # noqa: E402
from lsenerf_tpu.ops import march as march_lib  # noqa: E402

trainer, state = _flagship(tiny=False)
mcfg = trainer.model_config
dm = trainer.dm

# warm toward occupancy steady state (same protocol as bench.py)
SCAN_K = 16
train_steps = trainer.make_train_step_multi(SCAN_K)
occ_update = trainer._occ_update


def chunk(state, step):
    batches = {
        k: jnp.asarray(v)
        for k, v in dm.next_train_stack(step, SCAN_K).items()
    }
    state = occ_update(state)
    return train_steps(state, batches)


state, m = with_tpu_retry(chunk, state, 0)
jax.block_until_ready(m["loss"])
warm_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 20
for i in range(warm_chunks):
    state, m = chunk(state, (i + 1) * SCAN_K)
jax.block_until_ready(m["loss"])
print(f"warmed {warm_chunks * SCAN_K} steps", flush=True)

# one real ray batch -> march -> contracted positions -> block keys
n_rays = dm.config.train_num_rays_per_batch
rng = np.random.default_rng(0)
cams = dm.col.cameras
idx = jnp.asarray(rng.integers(0, len(cams), n_rays), jnp.int32)
coords = jnp.asarray(
    np.stack(
        [rng.integers(0, cams.height, n_rays),
         rng.integers(0, cams.width, n_rays)], 1
    ).astype(np.float32)
)
bundle = cam_lib.generate_rays(cams, idx, coords)


@jax.jit
def keys_of_batch(state, bundle):
    samples = march_lib.march_rays(
        bundle, state.occ, mcfg.grid, mcfg.march_config()
    )
    n, k = samples.positions.shape[:2]
    pos = samples.positions.reshape(-1, 3)
    posn, _sel = field_lib.contract_positions(pos, mcfg.field)
    keys, _, _, _ = he._blocked_keys_fracs(posn, mcfg.field.hash)  # (L, n*k)
    return keys.reshape(-1, n, k), samples.mask


keys, mask = keys_of_batch(state, bundle)
keys = np.asarray(keys)  # (L, n, k)
mask = np.asarray(mask)  # (n, k)

L, n, k = keys.shape
print(f"\nrays={n} samples/ray={k} levels={L}")
print(f"valid sample fraction: {mask.mean():.3f}")
print("\n| level | mean distinct/ray | p95 | distinct frac (valid) |")
print("|---|---|---|---|")
tot_d = tot_v = 0.0
for l in range(L):
    kl = keys[l]  # (n, k)
    # count distinct among VALID samples per ray, in t-order (run starts)
    runs = np.zeros(n)
    dfrac_n = dfrac_d = 0.0
    starts = np.ones_like(kl, bool)
    starts[:, 1:] = kl[:, 1:] != kl[:, :-1]
    starts &= mask
    # a run interrupted by invalid slots restarts; fine (overcounts distinct)
    d = starts.sum(1)
    v = mask.sum(1)
    sel = v > 0
    tot_d += d.sum()
    tot_v += v.sum()
    print(
        f"| {l} | {d[sel].mean():.1f} | {np.percentile(d[sel], 95):.0f} "
        f"| {d.sum() / max(v.sum(), 1):.3f} |"
    )
print(f"\nTOTAL distinct fraction (valid rows): {tot_d / max(tot_v, 1):.3f}")
print(f"gather rows now: {L * n * k}, after perfect dedup: {int(tot_d)} "
      f"+ invalid slots")
