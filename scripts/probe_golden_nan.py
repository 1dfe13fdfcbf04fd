"""Reproduce + bisect the golden-run NaN (diverges between step 1407-1503).

Runs the production protocol on the golden scene for ~1600 steps per arm,
printing per-chunk loss / psnr / camera-opt norms, stopping at first NaN.
Arms isolate: spline+pose math (cam-opt off), bf16 (f32 arm), powpow
(identity evs mapper), deblur.

Usage: python scripts/probe_golden_nan.py [--arms baseline no_camopt f32 no_powpow]
"""

import argparse
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
]

ARMS = {
    "baseline": [],
    "no_camopt": [
        "--pipeline.datamanager.col-cam-optimizer.mode", "off",
        "--pipeline.datamanager.col-cam-optimizer.optim-type", "ns",
        "--pipeline.datamanager.evs-cam-optimizer.mode", "off",
    ],
    "f32": ["--pipeline.model.compute-dtype", "float32"],
    "no_powpow": ["--pipeline.model.evs-mapping-method", "identity"],
    "no_deblur": ["--pipeline.model.rgb-loss-type", "linspace"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="outputs/golden_real/scene")
    ap.add_argument("--arms", nargs="*", default=list(ARMS))
    ap.add_argument("--max-steps", type=int, default=1920)
    args = ap.parse_args()

    warmup()

    import train as train_mod
    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine.trainer import Trainer

    config0 = config_lib.parse_cli(BASE + ["--data", args.data])
    _, _, _, pcfg = config_lib.build_runtime_configs(config0)
    col, evs, eval_ds, sp = train_mod.build_datasets(config0, pcfg)
    print("parsed", flush=True)

    for arm in args.arms:
        config = config_lib.parse_cli(BASE + ARMS[arm] + ["--data", args.data])
        tcfg, mcfg, dmcfg, _ = config_lib.build_runtime_configs(config)
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
        first_nan = None
        for i in range(1, args.max_steps // SCAN_K):
            state, m = chunk(state, i * SCAN_K)
            if i % 8 == 0 or i == 1:
                vals = {
                    k: float(m[k])
                    for k in ("loss", "psnr", "event_loss",
                              "camera_opt_translation_col",
                              "camera_opt_rotation_col",
                              "camera_opt_translation_evs", "grad_overflow")
                    if k in m
                }
                line = " ".join(f"{k}={v:.5g}" for k, v in vals.items())
                print(f"[{arm}] step {(i + 1) * SCAN_K}: {line}", flush=True)
                if not math.isfinite(vals.get("loss", 0.0)):
                    first_nan = (i + 1) * SCAN_K
                    break
        print(f"[{arm}] RESULT: "
              + (f"NaN by step {first_nan}" if first_nan else "finite"),
              flush=True)
        del state, trainer, dm, train_steps, occ_update


if __name__ == "__main__":
    main()
