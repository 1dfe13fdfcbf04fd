#!/usr/bin/env python
"""Train / eval entry point for LSENeRF-TPU.

Capability parity with reference train.py: dotted CLI flags in the reference's
spellings, eval-mode config surgery (--is_eval / --do_pretrain / --is_render
with --load-dir/--load-config), config YAML save, checkpoint cadence, periodic
eval, seed handling. The distributed story differs by design: instead of
mp.spawn + NCCL process groups (reference train.py:114-234), a single process
drives all local devices through a jax.sharding mesh; multi-host runs call
jax.distributed.initialize() (--machine.num-devices>1 activates the mesh).

Examples:
    python train.py lsenerf --data <scene_dir> --max-num-iterations 30000
    python train.py lsenerf --data synthetic --pipeline.datamanager.rgb_frac 0.66
    python train.py lsenerf --is_eval True --load-dir <run>/checkpoints \
        --load-config <run>/config.yml
"""

from __future__ import annotations

import datetime
import os
import os.path as osp
import sys


def build_datasets(config, parser_cfg):
    """--data selects a real scene dir (LSENeRF-formatter layout) or the
    built-in synthetic sphere scene ('synthetic')."""
    data = config.data or config.pipeline.datamanager.data
    if not data or str(data).startswith("synthetic"):
        from lsenerf_tpu.data.synthetic import make_synthetic_scene

        col, evs = make_synthetic_scene(n_cams=12, h=64, w=64, focal=60.0)
        return col, evs, col, None
    from lsenerf_tpu.data.parser import SceneParser

    sp = SceneParser(str(data), parser_cfg)
    col = sp.parse_color(
        "train", is_eval=config.is_eval, do_pretrain=config.do_pretrain
    )
    evs = sp.parse_events() if config.pipeline.datamanager.rgb_frac < 1 else None
    eval_ds = sp.parse_color("val")
    return col, evs, eval_ds, sp


def main(argv=None):
    from lsenerf_tpu.engine import config as config_lib

    config = config_lib.parse_cli(argv)
    config.timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
    config = config_lib.modify_config(config)

    if config.data and not config.experiment_name or config.experiment_name == "unnamed":
        config.experiment_name = osp.basename(str(config.data).rstrip("/")) or "synthetic"

    base_dir = config.base_dir()
    os.makedirs(base_dir, exist_ok=True)
    config_lib.save_config(config, osp.join(base_dir, "config.yml"))
    print(f"[lsenerf-tpu] run dir: {base_dir}")

    import jax

    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import checkpoints as ckpt_lib
    from lsenerf_tpu.engine.trainer import Trainer
    from lsenerf_tpu.engine.writer import ScalarLogger, get_git_hash

    trainer_cfg, model_cfg, dm_cfg, parser_cfg = config_lib.build_runtime_configs(
        config
    )
    # multi-host / multi-device: one process per host, all devices in a 1-D
    # data mesh (reference used mp.spawn+NCCL per GPU, train.py:114-234).
    # Must happen before the datamanager so the per-host budget split and the
    # per-host sampling seed offset (reference seeds by rank, train.py:104)
    # are in place.
    mesh = None
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    if config.machine.num_devices > 1 or len(jax.devices()) > 1:
        from lsenerf_tpu.parallel import mesh as mesh_lib

        n_dev = (
            config.machine.num_devices
            if config.machine.num_devices > 1
            else len(jax.devices())
        )
        mesh = mesh_lib.make_mesh(n_dev)
        mesh_lib.round_rays_to_mesh(dm_cfg, mesh)
        print(
            f"[lsenerf-tpu] data-parallel over {n_dev} devices, "
            f"{jax.process_count()} host(s)"
        )

    # eval renders shard their ray chunks over the same mesh when the chunk
    # divides evenly (single-process only: full-image assembly is host-local)
    eval_mesh = None
    if mesh is not None and jax.process_count() == 1:
        if config.pipeline.model.eval_num_rays_per_chunk % mesh.devices.size == 0:
            eval_mesh = mesh
        else:
            print(
                "[lsenerf-tpu] eval chunk "
                f"{config.pipeline.model.eval_num_rays_per_chunk} does not "
                f"divide by {mesh.devices.size} devices — eval renders stay "
                "single-device"
            )

    col, evs, eval_ds, sp = build_datasets(config, parser_cfg)
    dm = MultiCamDataManager(
        dm_cfg, col, evs, seed=config.machine.seed + jax.process_index()
    )

    # full-trajectory spline knots (reference lse_datamanager.py:288-291)
    all_cameras = None
    if sp is not None and trainer_cfg.col_cam_opt.optim_type == "spline":
        all_cameras = sp.all_color_cameras()

    trainer = Trainer(
        trainer_cfg, model_cfg, dm, eval_dataset=eval_ds, all_cameras=all_cameras
    )
    state = trainer.setup(jax.random.PRNGKey(config.machine.seed))
    if mesh is not None:
        from lsenerf_tpu.parallel import mesh as mesh_lib

        state = mesh_lib.replicate(state, mesh)
        # shard the occupancy density sweep too (otherwise every device
        # repeats the full sweep)
        trainer._occ_update = trainer.make_occ_update(mesh=mesh)

    def graft_test_embedding(state):
        """Add the 1-row test embedding to the param tree (+ rebuild the
        optimizer for the new structure). Seeds from table row 21
        (reference lse_embeddings.py:63-68); a later checkpoint restore
        overwrites the seed when the checkpoint carries test_table."""
        from lsenerf_tpu.engine.trainer import build_optimizer
        from lsenerf_tpu.models import embeddings as emb_lib

        field_params = state.params["model"]["field"]
        if "appearance" not in field_params:
            return state
        field_params = dict(field_params)
        field_params["appearance"] = emb_lib.init_test_params(
            field_params["appearance"], model_cfg.field.embedding
        )
        model_params = dict(state.params["model"], field=field_params)
        state = state.replace(params=dict(state.params, model=model_params))
        trainer._tx = build_optimizer(trainer_cfg, state.params)
        state = state.replace(opt_state=trainer._tx.init(state.params))
        trainer._train_step = trainer.make_train_step()
        return state

    if (
        config.is_eval
        and not config.do_pretrain
        and config.pipeline.model.embed_config.eval_mode == "param"
    ):
        # emb_eval stage 2: create the test-embedding slot BEFORE restore so
        # the pretrain stage's LEARNED row grafts in from the checkpoint
        # (restore merges only keys present in the fresh tree). The pretrain
        # stage itself (do_pretrain) instead seeds AFTER restore, from the
        # restored train table's row 21 — see below.
        state = graft_test_embedding(state)

    # checkpoint restore (reference _load_checkpoint, lse_trainer.py:85-122).
    # --load-checkpoint restores the OPTIMIZERS + rng too (exact resume,
    # reference :108-120); --load-dir restores weights only (:105-106).
    if config.load_checkpoint and not config.is_eval:
        loaded_step, params, occ, opt_leaves, rng = ckpt_lib.load_checkpoint_full(
            osp.dirname(str(config.load_checkpoint))
        )
        state = ckpt_lib.restore_into_state(
            state, params, occ, loaded_step, opt_leaves=opt_leaves, rng=rng
        )
        print(f"[lsenerf-tpu] restored checkpoint step {loaded_step} "
              f"(exact resume: optimizer state "
              f"{'restored' if opt_leaves is not None else 'not in checkpoint'})")
    elif config.load_dir or config.load_checkpoint:
        load_dir = str(config.load_dir or osp.dirname(config.load_checkpoint))
        step = None if config.load_step < 0 else config.load_step
        loaded_step, params, occ = ckpt_lib.load_checkpoint(
            load_dir, step=step, strip_cameras=config.is_eval and not config.do_pretrain
        )
        state = ckpt_lib.restore_into_state(state, params, occ, loaded_step)
        print(f"[lsenerf-tpu] restored checkpoint step {loaded_step}")

    if config.do_pretrain:
        # emb_eval stage 1: seed the test embedding from the RESTORED train
        # table's row 21 (lse_trainer.py:40-44, lse_embeddings.py:63-68)
        state = graft_test_embedding(state)

    logger = ScalarLogger(base_dir)
    logger.log(0, {"commit": 0.0})
    print(f"[lsenerf-tpu] git {get_git_hash()[:12]}, devices {jax.devices()}")

    ckpt_dir = osp.join(base_dir, "checkpoints")

    from lsenerf_tpu.utils.tpu_retry import with_tpu_retry

    # Pre-warm the eval-render compile: the remote compile helper here is
    # far more likely to SIGILL on compiles issued late in a long-running
    # process, so compile the eval path up-front where it is reliable.
    if (
        eval_ds is not None
        and config.steps_per_eval_image <= config.max_num_iterations
        and not config.is_render
    ):
        from lsenerf_tpu.engine import renderer as _prerenderer

        try:
            with_tpu_retry(
                _prerenderer.render_image,
                state.params["model"], eval_ds.cameras, 0, state.occ,
                trainer.model_config,
                appearance_id=int(eval_ds.appearance_ids[0]),
                chunk=config.pipeline.model.eval_num_rays_per_chunk,
                mesh=eval_mesh,
                attempts=2,
            )
            print("[lsenerf-tpu] eval render path pre-compiled")
        except Exception as e:  # noqa: BLE001
            print(f"[lsenerf-tpu] eval render pre-compile failed "
                  f"({type(e).__name__}) — evals may be skipped")

    # THE loop (engine/loop.py — the same function Trainer.train drives, so
    # tests and the CLI exercise identical cadence logic). scan_steps > 1
    # amortizes per-dispatch host latency via lax.scan chunks (the dev chip's
    # tunnel costs ~20 ms/dispatch — the default 16 gives the CLI the same
    # throughput as bench.py); under a mesh, stacked batches shard along the
    # RAY axis so dispatch amortization and data parallelism compose.
    from lsenerf_tpu.engine.loop import run_training_loop

    loop_kwargs = dict(
        scan_steps=int(config.machine.scan_steps),
        mesh=mesh,
        eval_mesh=eval_mesh,
        logger=logger,
        eval_ds=eval_ds,
        eval_chunk=config.pipeline.model.eval_num_rays_per_chunk,
        eval_batch_rays=config.pipeline.datamanager.eval_num_rays_per_batch,
        ckpt_dir=ckpt_dir,
        base_dir=base_dir,
        is_render=config.is_render,
        apply_cam_opt=config.is_eval,
        evs_only=(config.pipeline.datamanager.rgb_frac == 0),
        profile_dir=os.environ.get("LSENERF_PROFILE_DIR"),
    )

    # Annealed-F (proposal_warmup_steps > 0): phase 1 trains placement-free
    # (proposal off, all max_samples occupancy slots) while the occ EMA is
    # still noise, then phase 2 switches to inverse-CDF proposal-F sampling.
    # TrainState is config-independent (param/opt shapes don't depend on F),
    # so the state carries across the recompile unchanged.
    total = config.max_num_iterations
    warmup_f = int(config.pipeline.model.proposal_warmup_steps)
    start_step = int(state.step)
    if (
        warmup_f > 0
        and model_cfg.proposal_samples > 0
        and not config.is_eval
        and not config.is_render
        and start_step < warmup_f
    ):
        from dataclasses import replace as dc_replace

        k1 = min(warmup_f - start_step, total)
        warm_trainer = Trainer(
            trainer_cfg,
            dc_replace(model_cfg, proposal_samples=0),
            dm,
            eval_dataset=eval_ds,
            all_cameras=all_cameras,
        )
        # adopt the existing state instead of warm_trainer.setup(): shapes
        # are F-independent and a second on-device init is wasted (and a
        # needless extra first-compile on flaky tunnels)
        from lsenerf_tpu.engine.trainer import build_optimizer

        warm_trainer._tx = build_optimizer(trainer_cfg, state.params)
        warm_trainer._train_step = warm_trainer.make_train_step()
        warm_trainer._occ_update = warm_trainer.make_occ_update(
            mesh=mesh if mesh is not None else None
        )
        print(f"[lsenerf-tpu] proposal warmup: {k1} steps at "
              f"max_samples={model_cfg.max_samples} uniform slots, then "
              f"F={model_cfg.proposal_samples}")
        state, _ = run_training_loop(
            warm_trainer, state, num_steps=k1, **loop_kwargs
        )
        total -= k1

    if total > 0:
        state, _ = run_training_loop(
            trainer, state, num_steps=total, **loop_kwargs
        )
    elif eval_ds is not None and not config.is_render:
        # zero remaining steps (e.g. a resumed run whose checkpoint frontier
        # already reached the target): the end-of-run full eval is the
        # deliverable, and the absolute-step eval-all cadence can no longer
        # fire inside the (empty) loop — run it directly
        from lsenerf_tpu.engine import evaluation

        means = with_tpu_retry(
            evaluation.average_eval_metrics,
            trainer, state, eval_ds, base_dir,
            chunk=config.pipeline.model.eval_num_rays_per_chunk,
            apply_cam_opt=config.is_eval,
            evs_only=(config.pipeline.datamanager.rgb_frac == 0),
            mesh=eval_mesh,
            attempts=3,
        )
        print("[eval @ resume] "
              + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
        # keep the run dir self-contained (a normal run's final save):
        # downstream stages resolve "the newest run dir" and load from its
        # checkpoints/ (e.g. the eval.sh stage of golden_real_scale.py)
        ckpt_lib.save_checkpoint(
            ckpt_dir, int(state.step) - 1, state.params, state.occ,
            opt_state=state.opt_state, rng=state.rng,
        )
    logger.close()
    print("[lsenerf-tpu] done")


if __name__ == "__main__":
    main(sys.argv[1:])
