"""Rays/s vs batch size for the flagship train step (VERDICT round-2 #1a).

Several per-step costs are batch-size-invariant (the windowed accumulate's
lax.map count is table-size-bound; march candidate machinery; occupancy
update amortization; dispatch), so rays/s should rise materially with batch
size. Measures steady-state throughput at a sweep of train_num_rays_per_batch
values with the same protocol as bench.py (warm to occupancy steady state,
then time scan-16 chunks).

Usage: python scripts/probe_batch_scaling.py [sizes...]
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

warmup()

from __graft_entry__ import _flagship  # noqa: E402

SCAN_K = 16


def measure(batch_size: int, warm_chunks: int = 12, n_chunks: int = 6) -> float:
    trainer, state = _flagship(tiny=False)
    trainer.dm.config.train_num_rays_per_batch = batch_size
    trainer.dm.config.update_num_batch_rays()
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
    for i in range(warm_chunks):
        state, m = chunk(state, (i + 1) * SCAN_K)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, m = chunk(state, (warm_chunks + i + 1) * SCAN_K)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return n_chunks * SCAN_K * batch_size / dt


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [3512, 8192, 16384, 32768, 65536]
    print("batch_rays  rays_per_sec  ms_per_step", flush=True)
    for bs in sizes:
        try:
            rps = measure(bs)
            print(f"{bs:>9}  {rps:>12.1f}  {1000.0 * bs / rps:>10.2f}", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM at the largest sizes is informative
            print(f"{bs:>9}  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
