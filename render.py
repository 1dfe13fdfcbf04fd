#!/usr/bin/env python
"""Render a trained model along a camera trajectory (the reference's
IS_RENDER mode, train.py:262-264 + lse_parser.get_all_cameras :455-463).

Usage:
    python render.py --load-dir <run>/checkpoints --load-config <run>/config.yml \
        [--data <scene_dir>] [--output-dir renders] [--traj train|full]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="render.py")
    ap.add_argument("--load-dir", required=True)
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--output-dir", default="renders")
    ap.add_argument("--traj", default="train", choices=["train", "full"])
    ap.add_argument("--chunk", type=int, default=4096)
    ns = ap.parse_args(argv)

    import jax
    import numpy as np

    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import checkpoints as ckpt_lib
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine import renderer
    from lsenerf_tpu.engine.trainer import Trainer
    from lsenerf_tpu.engine.writer import LSEWriter
    import train as train_cli

    config = config_lib.load_config(ns.load_config)
    config.is_render = True
    if ns.data:
        config.data = ns.data
    trainer_cfg, model_cfg, dm_cfg, parser_cfg = config_lib.build_runtime_configs(
        config
    )
    col, evs, eval_ds, sp = train_cli.build_datasets(config, parser_cfg)
    dm = MultiCamDataManager(dm_cfg, col, evs)
    trainer = Trainer(trainer_cfg, model_cfg, dm)
    state = trainer.setup(jax.random.PRNGKey(config.machine.seed))

    step, params, occ = ckpt_lib.load_checkpoint(ns.load_dir)
    state = ckpt_lib.restore_into_state(state, params, occ, step)
    print(f"[render] restored step {step}")

    cams = col.cameras
    if ns.traj == "full" and sp is not None:
        cams = sp.all_color_cameras()

    os.makedirs(ns.output_dir, exist_ok=True)
    writer = LSEWriter(ns.output_dir)
    for i in range(len(cams)):
        out = renderer.render_image(
            state.params["model"], cams, i, state.occ, trainer.model_config,
            appearance_id=int(col.appearance_ids[min(i, len(col.appearance_ids) - 1)]),
            chunk=ns.chunk,
        )
        writer.log_images({"img": out["rgb"], "depth": out["depth"] / out["depth"].max()})
        print(f"[render] frame {i + 1}/{len(cams)}")
    print(f"[render] wrote {len(cams)} frames to {ns.output_dir}/eval_results")


if __name__ == "__main__":
    main(sys.argv[1:])
