"""Measure the steady-state samples/ray distribution vs the march budget.

max_samples=48 (and max_candidates/max_coarse_segments) are sized for the
worst-case contracted far field, but every ray pays the full dense budget in
hash gathers + field evals + backward rows. If steady-state p99 is well
below the budget, a tighter budget cuts the dominant hash-path cost
~proportionally (same stride-quadrature contract, just tighter).

Warms the flagship bench scene (or --production, or --data <golden scene>)
to occupancy steady state, then reports the per-ray valid-sample histogram
over fresh batches.

Usage: python scripts/probe_sample_budget.py [--production] [--data DIR]
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

SCAN_K = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--production", action="store_true")
    ap.add_argument("--data", default=None, help="scene dir (CLI config path)")
    ap.add_argument("--warm-chunks", type=int, default=20)
    ap.add_argument("--batches", type=int, default=16)
    args = ap.parse_args()

    warmup()

    if args.data:
        import train as train_mod
        from lsenerf_tpu.data.datamanager import MultiCamDataManager
        from lsenerf_tpu.engine import config as config_lib
        from lsenerf_tpu.engine.trainer import Trainer

        config = config_lib.parse_cli([
            "lsenerf", "--data", args.data, "--output-dir", "/tmp/probe_sb",
            "--pipeline.datamanager.rgb_frac", "0.66",
            "--pipeline.model.rgb-loss-type",
            "deblur" if args.production else "linspace",
        ])
        tcfg, mcfg, dmcfg, pcfg = config_lib.build_runtime_configs(config)
        col, evs, eval_ds, sp = train_mod.build_datasets(config, pcfg)
        dm = MultiCamDataManager(dmcfg, col, evs, seed=96)
        trainer = Trainer(tcfg, mcfg, dm, eval_dataset=eval_ds)
    else:
        from __graft_entry__ import _flagship

        trainer, _ = _flagship(tiny=False, production=args.production)
    state = trainer.setup(jax.random.PRNGKey(96))
    mcfg = trainer.model_config
    dm = trainer.dm
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
    for i in range(args.warm_chunks):
        state, m = chunk(state, (i + 1) * SCAN_K)
    jax.block_until_ready(m["loss"])

    # per-ray valid-sample counts straight from the march on fresh batches
    from lsenerf_tpu.cameras import cameras as cam_lib
    from lsenerf_tpu.ops import march as march_lib

    march_cfg = mcfg.march_config()
    occ_cfg = mcfg.grid

    @jax.jit
    def counts_for(occ_state, idx, coords):
        bundle = cam_lib.generate_rays(dm.col.cameras, idx, coords)
        s = march_lib.march_rays(bundle, occ_state, occ_cfg, march_cfg)
        return s.mask.sum(axis=1), s.mask.shape[1]

    all_counts = []
    step0 = (args.warm_chunks + 1) * SCAN_K
    for i in range(args.batches):
        b = dm.next_train(step0 + i)
        idx = jnp.asarray(b["col_indices"][:, 0])
        coords = jnp.asarray(b["col_indices"][:, 1:].astype(np.float32))
        c, k = counts_for(state.occ, idx, coords)
        all_counts.append(np.asarray(c))
    c = np.concatenate(all_counts)
    qs = [50, 90, 95, 99, 99.9, 100]
    print(f"budget={int(k)} rays={len(c)} mean={c.mean():.1f} "
          + " ".join(f"p{q}={np.percentile(c, q):.0f}" for q in qs),
          flush=True)
    print("histogram:", np.bincount(c.astype(int), minlength=int(k) + 1).tolist(),
          flush=True)


if __name__ == "__main__":
    main()
