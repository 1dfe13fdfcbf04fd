"""Is bench.py's timing honest, given block_until_ready(scalar) lies on axon?

Runs the bench protocol at reduced scale twice: once blocking on the loss
scalar (bench.py's current protocol) and once forcing completion with a
host fetch of the loss. If the numbers diverge, bench.py has been
under-measuring (async dispatch, never waiting for device completion).
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

warmup()

from __graft_entry__ import _flagship  # noqa: E402

SCAN_K = 16

trainer, state = _flagship(tiny=False)
train_steps = trainer.make_train_step_multi(SCAN_K)
occ_update = trainer._occ_update
dm = trainer.dm


def chunk(state, step):
    batches = {
        k: jnp.asarray(v)
        for k, v in dm.next_train_stack(step, SCAN_K).items()
    }
    state = occ_update(state)
    return train_steps(state, batches)


state, m = with_tpu_retry(chunk, state, 0)
jax.block_until_ready(m["loss"])
# absorb the one-time host-fetch channel setup
_ = np.asarray(m["loss"])

for i in range(6):
    state, m = chunk(state, (i + 1) * SCAN_K)
_ = np.asarray(m["loss"])
print("warmed 96 steps", flush=True)

n_chunks = 4
base = 7

# protocol A: bench.py as-is (block_until_ready on the loss scalar)
t0 = time.perf_counter()
for i in range(n_chunks):
    state, m = chunk(state, (base + i) * SCAN_K)
jax.block_until_ready(m["loss"])
dt_a = time.perf_counter() - t0

# protocol B: force completion with a host fetch
t0 = time.perf_counter()
for i in range(n_chunks):
    state, m = chunk(state, (base + n_chunks + i) * SCAN_K)
_ = np.asarray(m["loss"])
dt_b = time.perf_counter() - t0

# protocol B again (stability)
t0 = time.perf_counter()
for i in range(n_chunks):
    state, m = chunk(state, (base + 2 * n_chunks + i) * SCAN_K)
_ = np.asarray(m["loss"])
dt_b2 = time.perf_counter() - t0

steps = n_chunks * SCAN_K
print(f"A block(scalar): {dt_a/steps*1e3:.1f} ms/step")
print(f"B host-fetch:    {dt_b/steps*1e3:.1f} ms/step")
print(f"B repeat:        {dt_b2/steps*1e3:.1f} ms/step")
