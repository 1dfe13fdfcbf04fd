"""Benchmark: flagship-config training rays/sec on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no numbers. The
comparison constant below is an engineering estimate of the reference stack's
training throughput on its intended GPU (tcnn-backed Instant-NGP trainers
sustain ~100-130 steps/s at 3512 rays/step on an RTX 3090-class card =>
~4.0e5 rays/s). vs_baseline = ours / that estimate; the ≥5x/chip target from
BASELINE.md means vs_baseline >= 5.
"""

import json
import time

REFERENCE_RAYS_PER_SEC_ESTIMATE = 4.0e5


def main():
    import jax

    from __graft_entry__ import _flagship

    trainer, state = _flagship(tiny=False)
    train_step = trainer._train_step
    occ_update = trainer._occ_update

    rays_per_step = trainer.dm.config.train_num_rays_per_batch

    import jax.numpy as jnp

    def step_once(state):
        batch = {k: jnp.asarray(v) for k, v in trainer.dm.next_train(0).items()}
        return train_step(state, batch)

    # warmup/compile
    state = occ_update(state)
    state, m = step_once(state)
    jax.block_until_ready(m["loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        if i % trainer.model_config.grid.update_interval == 0:
            state = occ_update(state)
        state, m = step_once(state)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * rays_per_step / dt
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
