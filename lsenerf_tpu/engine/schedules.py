"""LR schedules matching nerfstudio's ExponentialDecayScheduler semantics
(used by the reference optimizer config, lse_config.py:29-38):
lr(step) = lr_init * (lr_final / lr_init) ** (step / max_steps), held at
lr_final beyond max_steps, with an optional warmup ramp."""

from __future__ import annotations

import jax.numpy as jnp


def exponential_decay(
    lr_init: float, lr_final: float, max_steps: int, warmup_steps: int = 0
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warmup = lr_init * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0, 1)
            )
        else:
            warmup = lr_init
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        decayed = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return jnp.where(step < warmup_steps, warmup, decayed) if warmup_steps > 0 else decayed

    return schedule
