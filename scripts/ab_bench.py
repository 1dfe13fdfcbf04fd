"""A/B throughput harness: steady-state rays/s for named config variants.

Same protocol as bench.py (warm to occupancy steady state, time scan-16
chunks) so deltas here are directly comparable to the published bench
number. Variants are applied as env overrides read by __graft_entry__._flagship.

Usage: python scripts/ab_bench.py [variant ...]   (default: all)
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

warmup()

SCAN_K = 16

VARIANTS = {
    # proposal relocation became the default (F=16) in round 4; pin the
    # historical 48-uniform-slot baseline explicitly so deltas stay comparable
    "baseline": {"LSENERF_PROPOSAL": "0"},
    "dense_fwd_3375": {"LSENERF_DENSE_FWD": "4096"},   # levels 0-2 via MXU
    "dense_fwd_9261": {"LSENERF_DENSE_FWD": "16383"},  # levels 0-3 via MXU
    "supergrid_matmul": {"LSENERF_SUPERGRID_MATMUL": "1"},  # march phase 1
    "supergrid_gather": {"LSENERF_SUPERGRID_MATMUL": "0"},  # pre-r3 baseline
    "packed_phase2": {"LSENERF_PACKED_PHASE2": "1"},  # march phase 2 bitpack (now default)
    "gather_phase2": {"LSENERF_PACKED_PHASE2": "0"},  # pre-bitpack phase 2
    "segmented_sort": {"LSENERF_SEGMENTED_SORT": "1"},  # batched per-level bwd sort (measured SLOWER, off)
    "global_sort": {"LSENERF_SEGMENTED_SORT": "0"},  # single 1.85M-key sort (default)
    # accumulate tiling: one-hot matmul flops scale with window; lax.map
    # iteration count with n_windows/batch_windows. Smaller windows at the
    # SAME iteration count (bw scaled up) cut flops 2-4x.
    "acc_256_64": {"LSENERF_ACC_WINDOW": "256", "LSENERF_ACC_BW": "64"},
    "acc_128_128": {"LSENERF_ACC_WINDOW": "128", "LSENERF_ACC_BW": "128"},
    "acc_1024_16": {"LSENERF_ACC_WINDOW": "1024", "LSENERF_ACC_BW": "16"},
    # proposal-guided sample relocation (round 4): field evals/ray drop from
    # max_samples=48 to F, placed by inverse-CDF over the occ EMA
    "proposal_32": {"LSENERF_PROPOSAL": "32"},
    "proposal_24": {"LSENERF_PROPOSAL": "24"},
    "proposal_16": {"LSENERF_PROPOSAL": "16"},
    "proposal_12": {"LSENERF_PROPOSAL": "12"},
    # F-cliff sweep (VERDICT r4 #3): step time is not affine in F — 32->24
    # bought 2 ms while 24->16 bought 19 ms, so some intermediate crosses a
    # tiling/window quantum between 24 and 16. Bracket the cliff (18..22)
    # and probe below the knee (13..15).
    "proposal_22": {"LSENERF_PROPOSAL": "22"},
    "proposal_20": {"LSENERF_PROPOSAL": "20"},
    "proposal_18": {"LSENERF_PROPOSAL": "18"},
    "proposal_15": {"LSENERF_PROPOSAL": "15"},
    "proposal_14": {"LSENERF_PROPOSAL": "14"},
    "proposal_13": {"LSENERF_PROPOSAL": "13"},
    # strided coarse-level sampling (VERDICT r3 lever 1b): hash levels 0-3
    # encoded at every S-th sample + lerped in t; composes with proposal-16
    "coarse_stride_2": {"LSENERF_COARSE_STRIDE": "2"},
    "coarse_stride_4": {"LSENERF_COARSE_STRIDE": "4"},
    "coarse_stride_8": {"LSENERF_COARSE_STRIDE": "8"},
    # striding under the 48-uniform-slot sampler (proposal off): 3x the
    # coarse redundancy of F=16 — the regime where the lever could still pay
    "stride8_prop0": {"LSENERF_COARSE_STRIDE": "8", "LSENERF_PROPOSAL": "0"},
}


def measure(env: dict, warm_chunks: int = 16, n_chunks: int = 6) -> float:
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from __graft_entry__ import _flagship

        trainer, state = _flagship(tiny=False)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    train_steps = trainer.make_train_step_multi(SCAN_K)
    occ_update = trainer._occ_update
    dm = trainer.dm
    rays = dm.config.train_num_rays_per_batch

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
    return n_chunks * SCAN_K * rays / dt


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            rps = measure(VARIANTS[name])
            print(f"{name:>18}: {rps:10.1f} rays/s "
                  f"({1000.0 * 3512 / rps:6.2f} ms/step)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>18}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
