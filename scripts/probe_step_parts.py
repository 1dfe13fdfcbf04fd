"""Decompose the steady-state train step into forward / backward / optimizer.

The isolated-stage numbers in scripts/profile_step.py overestimate (XLA fuses
aggressively in-step), so this probe measures WHOLE steps with parts swapped
out, at the exact bench protocol (scan-16 chunks, occupancy steady state):

  full      the real step: value_and_grad + Adam(multi_transform)
  sgd       value_and_grad + plain optax.sgd  -> delta = Adam moments cost
  no_opt    value_and_grad, updates discarded -> delta = optimizer math
  fwd_only  loss forward only                 -> delta = whole backward

Each variant chains a donated state through the scan like the real step so
the tunnel cannot dedup or pipeline past it (see probe_bench_honesty.py).
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

warmup()

SCAN_K = 16
WARM_CHUNKS = 16
N_CHUNKS = 6


def build_variants(trainer):
    import functools

    loss_fn = trainer._build_loss_fn()
    tx_full = trainer._tx
    # mirror the "fields" group lr so sgd is shape-compatible
    tx_sgd = optax.sgd(1e-2)

    def make(kind):
        def step_impl(state, batch):
            rng_next, rng_step = jax.random.split(state.rng)
            if kind == "fwd_only":
                loss, metrics = loss_fn(
                    state.params, state.occ, batch, state.step, rng_step
                )
                new_params, new_opt = state.params, state.opt_state
            else:
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, state.occ, batch, state.step, rng_step)
                if kind == "full":
                    updates, new_opt = tx_full.update(
                        grads, state.opt_state, state.params
                    )
                    new_params = optax.apply_updates(state.params, updates)
                elif kind == "sgd":
                    updates, new_opt = tx_sgd.update(
                        grads, state.opt_state, state.params
                    )
                    new_params = optax.apply_updates(state.params, updates)
                else:  # no_opt: consume grads cheaply so they aren't DCE'd
                    new_opt = state.opt_state
                    new_params = jax.tree.map(
                        lambda p, g: p + 0.0 * jnp.max(jnp.abs(g)), state.params, grads
                    )
            metrics["loss"] = loss
            return (
                state.replace(
                    step=state.step + 1, params=new_params, opt_state=new_opt,
                    rng=rng_next,
                ),
                metrics,
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_steps(state, batches):
            state, ms = jax.lax.scan(step_impl, state, batches)
            return state, jax.tree.map(lambda x: x[-1], ms)

        return train_steps

    return make, tx_sgd


def main():
    from __graft_entry__ import _flagship

    print("setup: building flagship trainer...", flush=True)
    trainer, state0 = _flagship(tiny=False)
    make, tx_sgd = build_variants(trainer)
    print("setup done", flush=True)
    occ_update = trainer._occ_update
    dm = trainer.dm
    rays = dm.config.train_num_rays_per_batch

    results = {}
    for kind in ("full", "sgd", "no_opt", "fwd_only"):
        state = state0 if kind == "full" else None
        if state is None:
            # fresh params/opt per variant (donation consumed the previous)
            trainer2, state = _flagship(tiny=False)
        if kind == "sgd":
            state = state.replace(opt_state=tx_sgd.init(state.params))
        steps = make(kind)

        def chunk(state, step):
            batches = {
                k: jnp.asarray(v)
                for k, v in dm.next_train_stack(step, SCAN_K).items()
            }
            state = occ_update(state)
            return steps(state, batches)

        print(f"[{kind}] compiling...", flush=True)
        state, m = with_tpu_retry(chunk, state, 0)
        jax.block_until_ready(m["loss"])
        print(f"[{kind}] compiled; warming {WARM_CHUNKS} chunks", flush=True)
        for i in range(WARM_CHUNKS):
            state, m = chunk(state, (i + 1) * SCAN_K)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(N_CHUNKS):
            state, m = chunk(state, (WARM_CHUNKS + i + 1) * SCAN_K)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        ms_per_step = 1e3 * dt / (N_CHUNKS * SCAN_K)
        results[kind] = round(ms_per_step, 2)
        print(f"[{kind}] {ms_per_step:.2f} ms/step "
              f"({N_CHUNKS * SCAN_K * rays / dt:,.0f} rays/s)", flush=True)

    full = results["full"]
    print(json.dumps({
        **results,
        "adam_vs_sgd_ms": round(full - results["sgd"], 2),
        "optimizer_ms": round(full - results["no_opt"], 2),
        "backward_ms": round(results["no_opt"] - results["fwd_only"], 2),
        "forward_ms": results["fwd_only"],
    }))


if __name__ == "__main__":
    main()
