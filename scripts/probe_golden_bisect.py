"""Bisect the golden real-scale step-time anomaly across config variants.

probe_golden_speed measured ~1170 ms/step on the VGA/200-camera golden scene
vs ~61 ms/step for the bench flagship (4.7k rendered rays vs 11.7k — only
~2.5x). This parses the scene ONCE and times the jitted chunk for several
flag variants to find which config axis (deblur x4, spline, neither) carries
the anomaly, or whether the scene itself does.

Usage: python scripts/probe_golden_bisect.py [--data outputs/golden_real/scene]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsenerf_tpu.utils.tpu_retry import warmup, with_tpu_retry  # noqa: E402

SCAN_K = 16

BASE = [
    "lsenerf",
    "--output-dir", "/tmp/probe_golden_out",
    "--machine.seed", "96",
    "--pipeline.datamanager.rgb_frac", "0.66",
    "--pipeline.model.ev-one-dim", "gt",
    "--pipeline.model.use-mapping", "True",
    "--pipeline.model.mapping-method", "identity",
    "--pipeline.model.evs-mapping-method", "powpow",
    "--pipeline.model.map-mode", "co_map",
    "--pipeline.datamanager.evs-cam-optimizer.mode", "SO3xR3",
]

SPLINE = [
    "--pipeline.datamanager.col-cam-optimizer.mode", "SO3xR3",
    "--pipeline.datamanager.col-cam-optimizer.optim-type", "spline",
    "--pipeline.datamanager.col-cam-optimizer.exp-t", "30000",
]
NS = [
    "--pipeline.datamanager.col-cam-optimizer.mode", "SO3xR3",
    "--pipeline.datamanager.col-cam-optimizer.optim-type", "ns",
]

VARIANTS = {
    "deblur+spline": SPLINE + ["--pipeline.model.rgb-loss-type", "deblur"],
    "deblur+ns": NS + ["--pipeline.model.rgb-loss-type", "deblur"],
    "linspace+spline": SPLINE + ["--pipeline.model.rgb-loss-type", "linspace"],
    "linspace+ns": NS + ["--pipeline.model.rgb-loss-type", "linspace"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="outputs/golden_real/scene")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--warm", type=int, default=4)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    args = ap.parse_args()

    warmup()

    import train as train_mod
    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine.trainer import Trainer

    t0 = time.perf_counter()
    config0 = config_lib.parse_cli(BASE + SPLINE + ["--data", args.data])
    _, _, _, parser_cfg = config_lib.build_runtime_configs(config0)
    col, evs, eval_ds, sp = train_mod.build_datasets(config0, parser_cfg)
    print(f"parse: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for name in args.variants:
        flags = VARIANTS[name]
        config = config_lib.parse_cli(BASE + flags + ["--data", args.data])
        trainer_cfg, model_cfg, dm_cfg, _ = config_lib.build_runtime_configs(
            config
        )
        dm = MultiCamDataManager(dm_cfg, col, evs, seed=96)
        all_cameras = sp.all_color_cameras() if sp is not None else None
        trainer = Trainer(
            trainer_cfg, model_cfg, dm, eval_dataset=eval_ds,
            all_cameras=all_cameras,
        )
        state = trainer.setup(jax.random.PRNGKey(96))
        train_steps = trainer.make_train_step_multi(SCAN_K)
        occ_update = trainer._occ_update

        def chunk(state, step):
            raw = dm.next_train_stack(step, SCAN_K)
            batches = {k: jnp.asarray(v) for k, v in raw.items()}
            state = occ_update(state)
            return train_steps(state, batches)

        t0 = time.perf_counter()
        state, m = with_tpu_retry(chunk, state, 0)
        jax.block_until_ready(m["loss"])
        t_compile = time.perf_counter() - t0
        for i in range(args.warm):
            state, m = chunk(state, (i + 1) * SCAN_K)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.chunks):
            state, m = chunk(state, (args.warm + 1 + i) * SCAN_K)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.chunks / SCAN_K * 1e3
        results[name] = (dt, t_compile)
        print(
            f"{name:>18}: {dt:8.2f} ms/step  (compile+first {t_compile:.1f}s)",
            flush=True,
        )
        del state, trainer, dm, train_steps, occ_update

    print({k: round(v[0], 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
