"""Find WHICH parameter goes non-finite first in the golden-run divergence.

Runs the production protocol on the golden scene, fetching per-chunk host
stats of every leaf in the param tree (max |value|) plus key scalars
(pow_coeff) until the first non-finite loss, then prints the last two
snapshots so the exploding subtree is visible.

Usage: python scripts/probe_nan_instrument.py
"""

import math
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

SCAN_K = 16

BASE = [
    "lsenerf",
    "--output-dir", "/tmp/probe_nan_out",
    "--machine.seed", "96",
    "--pipeline.datamanager.rgb_frac", "0.66",
    "--pipeline.model.rgb-loss-type", "deblur",
    "--pipeline.model.ev-one-dim", "gt",
    "--pipeline.model.use-mapping", "True",
    "--pipeline.model.mapping-method", "identity",
    "--pipeline.model.evs-mapping-method", "powpow",
    "--pipeline.model.map-mode", "co_map",
    "--pipeline.datamanager.col-cam-optimizer.mode", "SO3xR3",
    "--pipeline.datamanager.col-cam-optimizer.optim-type", "spline",
    "--pipeline.datamanager.col-cam-optimizer.exp-t", "30000",
    "--pipeline.datamanager.evs-cam-optimizer.mode", "SO3xR3",
    "--pipeline.model.grad-overflow-telemetry", "True",
]


def _device_leaf_stats(params):
    """(max|.|, finite fraction) per leaf, computed on device — fetching
    the raw leaves (the 12.6M-row hash table) through the tunnel costs
    seconds per chunk; two scalars per leaf cost nothing."""
    import jax.numpy as jnp

    def stats(leaf):
        a = jnp.abs(leaf.astype(jnp.float32))
        return jnp.max(a), jnp.mean(jnp.isfinite(leaf).astype(jnp.float32))

    return jax.tree_util.tree_map(stats, params)


_device_leaf_stats_jit = None


def leaf_stats(params):
    global _device_leaf_stats_jit
    if _device_leaf_stats_jit is None:
        _device_leaf_stats_jit = jax.jit(_device_leaf_stats)
    flat = jax.tree_util.tree_flatten_with_path(
        _device_leaf_stats_jit(params)
    )[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path[:-1]
        )
        out.setdefault(name, []).append(float(leaf))
    return {k: tuple(v) for k, v in out.items()}


def main():
    warmup()

    import train as train_mod
    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine.trainer import Trainer

    config = config_lib.parse_cli(BASE + ["--data", "outputs/golden_real/scene"])
    tcfg, mcfg, dmcfg, pcfg = config_lib.build_runtime_configs(config)
    col, evs, eval_ds, sp = train_mod.build_datasets(config, pcfg)
    dm = MultiCamDataManager(dmcfg, col, evs, seed=96)
    all_cameras = sp.all_color_cameras() if sp is not None else None
    trainer = Trainer(tcfg, mcfg, dm, eval_dataset=eval_ds,
                      all_cameras=all_cameras)
    state = trainer.setup(jax.random.PRNGKey(96))
    train_steps = trainer.make_train_step_multi(SCAN_K)
    occ_update = trainer._occ_update

    def chunk(state, step):
        raw = dm.next_train_stack(step, SCAN_K)
        batches = {k: jnp.asarray(v) for k, v in raw.items()}
        state = occ_update(state)
        return train_steps(state, batches)

    state, m = with_tpu_retry(chunk, state, 0)
    prev_snap = None
    for i in range(1, 260):
        state, m = chunk(state, i * SCAN_K)
        loss = float(m["loss"])
        snap = leaf_stats(state.params)
        pc = snap.get("model/evs_mapper/pow_coeff", (float("nan"),) * 2)[0]
        worst = max(snap.items(), key=lambda kv: kv[1][0])
        ovf = float(m.get("grad_overflow", float("nan")))
        evl = float(m.get("event_loss", float("nan")))
        print(
            f"step {(i + 1) * SCAN_K}: loss={loss:.5g} ev={evl:.5g} "
            f"ovf={ovf:g} pow_coeff={pc:.4f} "
            f"max_leaf={worst[0]}:{worst[1][0]:.4g}",
            flush=True,
        )
        bad = [k for k, v in snap.items() if v[1] < 1.0]
        if bad or not math.isfinite(loss):
            print(f"NON-FINITE at step {(i + 1) * SCAN_K}; bad leaves: {bad}")
            if prev_snap:
                print("previous snapshot (max|.|):")
                for k, v in sorted(prev_snap.items(),
                                   key=lambda kv: -kv[1][0])[:12]:
                    print(f"  {k}: {v[0]:.5g}")
            break
        prev_snap = snap
    else:
        print("RESULT: finite through", 260 * SCAN_K)


if __name__ == "__main__":
    main()
