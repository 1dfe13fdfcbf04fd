#!/usr/bin/env python
"""Serve the interactive web viewer for a trained model.

TPU-native stand-in for the nerfstudio viser viewer the reference inherits
(never exercised there — reference training uses tensorboard vis). Loads a
checkpoint exactly like render.py, then serves an orbit UI that renders
through the shared zero-recompile chunk renderer.

Usage:
    python viewer.py --load-dir <run>/checkpoints --load-config <run>/config.yml \
        [--data <scene_dir>] [--host 127.0.0.1] [--port 7007] \
        [--resolutions 96,384]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="viewer.py")
    ap.add_argument("--load-dir", required=True)
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument(
        "--resolutions", default="96,384",
        help="comma-separated max-dim ladder: first = drag preview, "
        "last = idle full render (each is one compile)",
    )
    ns = ap.parse_args(argv)

    import jax

    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import checkpoints as ckpt_lib
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine import viewer as viewer_lib
    from lsenerf_tpu.engine.trainer import Trainer
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
    print(f"[viewer] restored step {step}")

    session = viewer_lib.ViewerSession(
        state.params["model"], col.cameras, state.occ, trainer.model_config,
        appearance_id=int(col.appearance_ids[0]),
        resolutions=[int(r) for r in ns.resolutions.split(",")],
        chunk=ns.chunk,
    )
    viewer_lib.serve(session, host=ns.host, port=ns.port)


if __name__ == "__main__":
    main(sys.argv[1:])
