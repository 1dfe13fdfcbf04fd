"""Decompose the real-scale golden run's step time: host batch assembly vs
host->device transfer vs the jitted device chunk.

The bench-scene production config measures ~56k rays/s, yet the first golden
real-scale attempt trained at ~2.2 steps/s (~460 ms/step) — this probe finds
where the other ~400 ms went on the actual VGA/200-camera scene.

Usage: python scripts/probe_golden_speed.py [--data outputs/golden_real/scene]
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

GOLDEN_FLAGS = [
    "lsenerf",
    "--output-dir", "/tmp/probe_golden_out",
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="outputs/golden_real/scene")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("extra", nargs="*", help="extra train.py flags")
    args = ap.parse_args()

    warmup()

    import train as train_mod
    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine.trainer import Trainer

    config = config_lib.parse_cli(
        GOLDEN_FLAGS + ["--data", args.data] + list(args.extra)
    )
    trainer_cfg, model_cfg, dm_cfg, parser_cfg = config_lib.build_runtime_configs(
        config
    )
    t0 = time.perf_counter()
    col, evs, eval_ds, sp = train_mod.build_datasets(config, parser_cfg)
    print(f"parse: {time.perf_counter() - t0:.1f}s", flush=True)
    dm = MultiCamDataManager(dm_cfg, col, evs, seed=96)
    all_cameras = sp.all_color_cameras() if sp is not None else None
    trainer = Trainer(
        trainer_cfg, model_cfg, dm, eval_dataset=eval_ds, all_cameras=all_cameras
    )
    t0 = time.perf_counter()
    state = trainer.setup(jax.random.PRNGKey(96))
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)

    train_steps = trainer.make_train_step_multi(SCAN_K)
    occ_update = trainer._occ_update

    # --- host assembly cost
    t0 = time.perf_counter()
    for i in range(args.chunks):
        raw = dm.next_train_stack(i * SCAN_K, SCAN_K)
    host_ms = (time.perf_counter() - t0) / args.chunks / SCAN_K * 1e3
    print(f"host assembly: {host_ms:.2f} ms/step", flush=True)

    # --- transfer cost
    t0 = time.perf_counter()
    for i in range(args.chunks):
        batches = {k: jnp.asarray(v) for k, v in raw.items()}
        jax.block_until_ready(list(batches.values()))
    xfer_ms = (time.perf_counter() - t0) / args.chunks / SCAN_K * 1e3
    nbytes = sum(v.nbytes for v in batches.values())
    print(f"transfer: {xfer_ms:.2f} ms/step ({nbytes/1e6:.2f} MB/chunk)",
          flush=True)

    # --- device chunk (compile, then steady-state timing)
    def chunk(state, step):
        raw = dm.next_train_stack(step, SCAN_K)
        batches = {k: jnp.asarray(v) for k, v in raw.items()}
        state = occ_update(state)
        return train_steps(state, batches)

    t0 = time.perf_counter()
    state, m = with_tpu_retry(chunk, state, 0)
    jax.block_until_ready(m["loss"])
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(12):  # warm toward occupancy steady state
        state, m = chunk(state, (i + 1) * SCAN_K)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.chunks):
        state, m = chunk(state, (13 + i) * SCAN_K)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.chunks / SCAN_K * 1e3
    rays = dm.config.train_num_rays_per_batch
    print(f"full chunk loop: {dt:.2f} ms/step ({1e3 * rays / dt:.0f} rays/s)",
          flush=True)


if __name__ == "__main__":
    main()
