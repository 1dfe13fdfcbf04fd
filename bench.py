"""Benchmark: flagship-config training rays/sec on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement: the full flagship train step (16-level 2^19 hash grid, 3512
rays/step, co_map + powpow mapping, event supervision) run as a K-step
lax.scan per device call (amortizes host dispatch; the dev chip here sits
behind a network tunnel with ~20 ms RTT per call).

Baseline context (BASELINE.md): the reference publishes no numbers. The
comparison constant below is an engineering estimate of the reference stack's
training throughput on its intended GPU (tcnn-backed Instant-NGP trainers
sustain ~100-130 steps/s at 3512 rays/step on an RTX 3090-class card =>
~4.0e5 rays/s). vs_baseline = ours / that estimate; the >=5x/chip target from
BASELINE.md means vs_baseline >= 5.
"""

import argparse
import json
import time

REFERENCE_RAYS_PER_SEC_ESTIMATE = 4.0e5
SCAN_K = 16  # steps per device call == occupancy update interval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--trace",
        default=None,
        metavar="DIR",
        help="write a jax.profiler trace of the timed steps to DIR "
        "(inspect with tensorboard / xprof; see scripts/profile_step.py "
        "for the per-stage cost breakdown table)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry

    warmup()

    from __graft_entry__ import _flagship

    trainer, state = _flagship(tiny=False)
    train_steps = trainer.make_train_step_multi(SCAN_K)
    occ_update = trainer._occ_update
    rays_per_step = trainer.dm.config.train_num_rays_per_batch

    def chunk(state, step):
        batches = {
            k: jnp.asarray(v)
            for k, v in trainer.dm.next_train_stack(step, SCAN_K).items()
        }
        state = occ_update(state)
        return train_steps(state, batches)

    # warmup/compile, then run to occupancy steady state: a fresh grid is
    # fully occupied (worst-case 48 samples/ray); real training converges the
    # binary grid within a few hundred steps, which is what any NGP-class
    # throughput number measures
    state, m = with_tpu_retry(chunk, state, 0)
    jax.block_until_ready(m["loss"])
    warm_chunks = 20
    for i in range(warm_chunks):
        state, m = chunk(state, (i + 1) * SCAN_K)
    jax.block_until_ready(m["loss"])

    n_chunks = 8

    def timed_run(state):
        t0 = time.perf_counter()
        for i in range(n_chunks):
            state, m = chunk(state, (warm_chunks + i + 1) * SCAN_K)
        jax.block_until_ready(m["loss"])
        return time.perf_counter() - t0

    if args.trace:
        with jax.profiler.trace(args.trace):
            dt = timed_run(state)
    else:
        dt = timed_run(state)

    rays_per_sec = n_chunks * SCAN_K * rays_per_step / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
