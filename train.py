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
import math
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
    from lsenerf_tpu.engine import evaluation
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
    # nerfstudio loop semantics: run max_num_iterations steps FROM the start
    # step (so eval-mode runs schedule steps_per_eval_all_images at
    # load_step + max_iter - 5, reference train.py:269)
    start = int(state.step)
    end = start + config.max_num_iterations if start > 0 else config.max_num_iterations
    import jax.numpy as jnp

    profile_dir = os.environ.get("LSENERF_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # lax.scan chunking: >1 amortizes the per-dispatch host latency (the dev
    # chip's tunnel costs ~20 ms/dispatch — the default scan_steps=16 gives
    # the CLI the same throughput as bench.py). Under a mesh, stacked
    # batches are sharded along the RAY axis (axis 1) so dispatch
    # amortization and data parallelism compose (mesh.shard_batch_stacked).
    scan_k = max(1, int(config.machine.scan_steps))
    train_steps_multi = (
        trainer.make_train_step_multi(scan_k) if scan_k > 1 else None
    )

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

    def covered(first, every, k=None):
        """Does [first, first+k-1] contain a multiple of `every`?"""
        if first <= 0:
            return True
        k = scan_k if k is None else k
        return (first + k - 1) // every > (first - 1) // every

    # eval-ray-batch loss cadence (reference steps_per_eval_batch=500,
    # lse_config.py:16): one jitted fn reused across all cadence hits
    eval_batch_fn = None
    if eval_ds is not None and not config.is_render:
        import numpy as _np

        eval_batch_fn = trainer.make_eval_batch_fn(eval_ds.cameras)
        eval_batch_rng = _np.random.default_rng(config.machine.seed + 17)

    first_dispatch = True
    for it in range(start, end, scan_k):
        # trim the final chunk so the loop never trains past `end`
        # (the remainder runs as single steps — one extra compile at most)
        k_eff = min(scan_k, end - it)
        if not config.is_render and covered(it, model_cfg.grid.update_interval, k_eff):
            if first_dispatch:
                # first device compile of the process: the remote TPU
                # compile helper intermittently SIGILLs there (see
                # utils/tpu_retry.py) — retry with cooldown
                state = with_tpu_retry(trainer._occ_update, state)
            else:
                state = trainer._occ_update(state)
        if scan_k > 1 and k_eff == scan_k:
            raw_stack = dm.next_train_stack(it, scan_k)
            if mesh is not None:
                from lsenerf_tpu.parallel import mesh as mesh_lib

                batches = mesh_lib.shard_batch_stacked(raw_stack, mesh)
            else:
                batches = {k: jnp.asarray(v) for k, v in raw_stack.items()}
            step_fn, batch_list = train_steps_multi, [batches]
        else:
            batch_list = []
            for j in range(k_eff):
                raw = dm.next_train(it + j)
                if mesh is not None:
                    from lsenerf_tpu.parallel import mesh as mesh_lib

                    batch_list.append(mesh_lib.shard_batch(raw, mesh))
                else:
                    batch_list.append(
                        {k: jnp.asarray(v) for k, v in raw.items()}
                    )
            step_fn = trainer._train_step
        for batch in batch_list:
            if first_dispatch:
                # the remote TPU compile helper intermittently crashes on the
                # first compile of a fresh process (see utils/tpu_retry.py)
                state, metrics = with_tpu_retry(step_fn, state, batch)
                first_dispatch = False
            else:
                state, metrics = step_fn(state, batch)
        # (make_train_step_multi already reduces metrics to the chunk's
        # last step)
        last = it + k_eff - 1  # true last completed step of this chunk
        if profile_dir and it - start >= 30:
            jax.profiler.stop_trace()
            profile_dir = None

        if covered(it, 100, k_eff):
            scal = {k: float(v) for k, v in metrics.items()}
            logger.log(last, scal)
            if not math.isfinite(scal.get("loss", 0.0)):
                # fail fast: keeping going would burn the remaining budget
                # training garbage (params are already non-finite)
                raise RuntimeError(
                    f"non-finite loss at step {last}: {scal} — aborting "
                    "(inspect with scripts/probe_nan_instrument.py)"
                )
            if covered(it, 1000, k_eff):
                print(f"step {last}: " + ", ".join(f"{k}={v:.4f}" for k, v in scal.items()))
        if (
            eval_batch_fn is not None
            and covered(it + 1, config.steps_per_eval_batch, k_eff)
        ):
            import numpy as _np

            nb = config.pipeline.datamanager.eval_num_rays_per_batch
            cams = eval_ds.cameras
            vi = eval_batch_rng.integers(0, len(eval_ds), nb)
            ys = eval_batch_rng.integers(0, cams.height, nb)
            xs = eval_batch_rng.integers(0, cams.width, nb)
            try:
                em = with_tpu_retry(
                    eval_batch_fn,
                    state.params, state.occ,
                    jnp.asarray(vi, jnp.int32),
                    jnp.asarray(_np.stack([ys, xs], 1), jnp.float32),
                    jnp.asarray(eval_ds.images[vi, ys, xs]),
                    jnp.asarray(eval_ds.appearance_ids[vi], jnp.int32),
                    attempts=2,
                )
                logger.log(last, {k: float(v) for k, v in em.items()})
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval-batch @ {last}] SKIPPED ({type(e).__name__})")
        if covered(it + 1, config.steps_per_eval_image, k_eff) and eval_ds is not None:
            # single-view eval (reference steps_per_eval_image cadence via
            # LSERandIndicesEvalDataloader, lse_datamanager.py:474-479)
            import numpy as _np

            from lsenerf_tpu.engine import renderer as _renderer
            from lsenerf_tpu.ops import metrics as _metrics

            # evals are auxiliary: a flaky eval-path compile (the remote
            # helper can SIGILL on ANY fresh compile) must not kill a
            # 200k-step training run — retry, then skip on failure
            vi = int(_np.random.default_rng(it).integers(0, len(eval_ds)))
            try:
                out = with_tpu_retry(
                    _renderer.render_image,
                    state.params["model"], eval_ds.cameras, vi, state.occ,
                    trainer.model_config,
                    appearance_id=int(eval_ds.appearance_ids[vi]),
                    chunk=config.pipeline.model.eval_num_rays_per_chunk,
                    mesh=eval_mesh,
                    attempts=3,
                )
                psnr_v = float(_metrics.psnr(
                    jnp.asarray(eval_ds.images[vi]), jnp.asarray(out["rgb"])
                ))
                logger.log(last, {"eval_psnr": psnr_v})
                print(f"[eval-image @ {last}] view {vi} psnr {psnr_v:.2f}")
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval-image @ {last}] SKIPPED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})")
        if covered(it + 1, config.steps_per_save, k_eff):
            ckpt_lib.save_checkpoint(
                ckpt_dir, last, state.params, state.occ,
                opt_state=state.opt_state, rng=state.rng,
            )
        if covered(it + 1, config.steps_per_eval_all_images, k_eff) and eval_ds is not None:
            try:
                means = with_tpu_retry(
                    evaluation.average_eval_metrics,
                    trainer, state, eval_ds, base_dir,
                    chunk=config.pipeline.model.eval_num_rays_per_chunk,
                    apply_cam_opt=config.is_eval,
                    evs_only=(config.pipeline.datamanager.rgb_frac == 0),
                    mesh=eval_mesh,
                    attempts=3,
                )
                print(f"[eval @ {last}] "
                      + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval @ {last}] SKIPPED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})")

    ckpt_lib.save_checkpoint(
        ckpt_dir, end - 1, state.params, state.occ,
        opt_state=state.opt_state, rng=state.rng,
    )
    logger.close()
    print("[lsenerf-tpu] done")


if __name__ == "__main__":
    main(sys.argv[1:])
