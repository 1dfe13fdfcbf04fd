"""THE training loop — single source of truth for cadence logic.

Shared by the CLI (train.py) and the library entry point (Trainer.train), so
tests exercise the exact loop users run (previously two divergent copies:
the full-featured CLI loop and a bare library loop — cadence/occ logic drift
between them was a standing risk).

Responsibilities (reference: nerfstudio Trainer.train + lse_trainer.py
callbacks, SURVEY.md section 2b):
  - occupancy-grid update cadence (grid.update_interval)
  - lax.scan step chunking (scan_steps amortizes per-dispatch host latency)
  - mesh sharding of ray batches (data parallel) when a mesh is given
  - scalar logging + fail-fast on non-finite loss
  - eval-ray-batch / eval-image / eval-all-images cadences
  - checkpoint cadence + final checkpoint
  - grad-overflow sentinel cadence (TrainerConfig.grad_overflow_every):
    production-real observability for the blocked backward's overflow
    contract at ~0.06% cost
  - optional jax.profiler trace of the first ~30 steps

Every optional subsystem degrades gracefully: no logger -> no writes (the
fail-fast check still runs), no eval_ds -> no evals, no ckpt_dir -> no
checkpoints, mesh None -> single device.
"""

from __future__ import annotations

import math
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.engine.trainer import RunMode, Trainer, TrainState
from lsenerf_tpu.utils.tpu_retry import with_tpu_retry


def _covered(first: int, every: int, k: int) -> bool:
    """Does the step range [first, first+k-1] contain a multiple of `every`?"""
    if every <= 0:
        return False
    if first <= 0:
        return True
    return (first + k - 1) // every > (first - 1) // every


def run_training_loop(
    trainer: Trainer,
    state: TrainState,
    *,
    num_steps: int | None = None,
    scan_steps: int = 1,
    mesh=None,
    eval_mesh=None,
    logger=None,
    eval_ds=None,
    eval_chunk: int = 4096,
    eval_batch_rays: int = 4096,
    ckpt_dir: str | None = None,
    base_dir: str | None = None,
    is_render: bool = False,
    apply_cam_opt: bool = False,
    evs_only: bool = False,
    profile_dir: str | None = None,
    log_every: int = 100,
    print_every: int = 1000,
    callback=None,
    fail_fast: bool = True,
):
    """Run `num_steps` training steps from the state's current step.

    Returns (state, last_metrics). Cadences (steps_per_save / eval_*) come
    from trainer.config; they fire on ABSOLUTE step numbers, so a resumed run
    keeps the original schedule (nerfstudio semantics: an eval-mode run
    loaded at step S schedules steps_per_eval_all_images at S + N - 5,
    reference train.py:269).
    """
    cfg = trainer.config
    dm = trainer.dm
    num_steps = num_steps or cfg.max_num_iterations
    scan_k = max(1, int(scan_steps))
    grid_every = trainer.model_config.grid.update_interval

    start = int(state.step)
    end = start + num_steps

    train_steps_multi = (
        trainer.make_train_step_multi(scan_k) if scan_k > 1 else None
    )

    # eval-ray-batch loss cadence (reference steps_per_eval_batch=500,
    # lse_config.py:16): one jitted fn reused across all cadence hits
    eval_batch_fn = None
    if eval_ds is not None and not is_render and cfg.steps_per_eval_batch > 0:
        eval_batch_fn = trainer.make_eval_batch_fn(eval_ds.cameras)
        eval_batch_rng = np.random.default_rng(cfg.seed + 17)

    # grad-overflow sentinel (blocked layout only; training mode only — a
    # frozen field can't accumulate table gradients)
    overflow_probe = None
    if (
        cfg.grad_overflow_every > 0
        and cfg.mode == RunMode.TRAIN
        and not is_render
    ):
        overflow_probe = trainer.make_overflow_probe()

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    def to_device(raw):
        if mesh is not None:
            from lsenerf_tpu.parallel import mesh as mesh_lib

            return mesh_lib.shard_batch(raw, mesh)
        return {k: jnp.asarray(v) for k, v in raw.items()}

    first_dispatch = True
    metrics = {}
    for it in range(start, end, scan_k):
        # trim the final chunk so the loop never trains past `end`
        # (the remainder runs as single steps — one extra compile at most)
        k_eff = min(scan_k, end - it)
        if not is_render and _covered(it, grid_every, k_eff):
            if first_dispatch:
                # first device compile of the process: the remote TPU compile
                # helper intermittently SIGILLs there (see utils/tpu_retry.py)
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
            batch_list = [to_device(dm.next_train(it + j)) for j in range(k_eff)]
            step_fn = trainer._train_step
        for batch in batch_list:
            if first_dispatch:
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

        if overflow_probe is not None and _covered(
            it + 1, cfg.grad_overflow_every, k_eff
        ):
            try:
                ov = overflow_probe(
                    state.params, state.occ, to_device(dm.next_train(last)),
                    state.step,
                )
                metrics = dict(metrics, grad_overflow=ov)
            except Exception as e:  # noqa: BLE001 — sentinel must not kill a run
                print(f"[overflow-probe @ {last}] SKIPPED ({type(e).__name__})")

        if _covered(it, log_every, k_eff):
            scal = {k: float(v) for k, v in metrics.items()}
            if logger is not None:
                logger.log(last, scal)
            if callback is not None:
                callback(last, scal)
            if fail_fast and not math.isfinite(scal.get("loss", 0.0)):
                # keeping going would burn the remaining budget training
                # garbage (params are already non-finite)
                raise RuntimeError(
                    f"non-finite loss at step {last}: {scal} — aborting "
                    "(inspect with scripts/probe_nan_instrument.py)"
                )
            if _covered(it, print_every, k_eff) and logger is not None:
                print(
                    f"step {last}: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in scal.items())
                )
        if eval_batch_fn is not None and _covered(
            it + 1, cfg.steps_per_eval_batch, k_eff
        ):
            cams = eval_ds.cameras
            nb = eval_batch_rays
            vi = eval_batch_rng.integers(0, len(eval_ds), nb)
            ys = eval_batch_rng.integers(0, cams.height, nb)
            xs = eval_batch_rng.integers(0, cams.width, nb)
            try:
                em = with_tpu_retry(
                    eval_batch_fn,
                    state.params, state.occ,
                    jnp.asarray(vi, jnp.int32),
                    jnp.asarray(np.stack([ys, xs], 1), jnp.float32),
                    jnp.asarray(eval_ds.images[vi, ys, xs]),
                    jnp.asarray(eval_ds.appearance_ids[vi], jnp.int32),
                    attempts=2,
                )
                if logger is not None:
                    logger.log(last, {k: float(v) for k, v in em.items()})
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval-batch @ {last}] SKIPPED ({type(e).__name__})")
        if eval_ds is not None and _covered(
            it + 1, cfg.steps_per_eval_image, k_eff
        ):
            # single-view eval (reference steps_per_eval_image cadence via
            # LSERandIndicesEvalDataloader, lse_datamanager.py:474-479)
            from lsenerf_tpu.engine import renderer as _renderer
            from lsenerf_tpu.ops import metrics as _metrics

            # evals are auxiliary: a flaky eval-path compile (the remote
            # helper can SIGILL on ANY fresh compile) must not kill a
            # 200k-step training run — retry, then skip on failure
            vi = int(np.random.default_rng(it).integers(0, len(eval_ds)))
            try:
                out = with_tpu_retry(
                    _renderer.render_image,
                    state.params["model"], eval_ds.cameras, vi, state.occ,
                    trainer.model_config,
                    appearance_id=int(eval_ds.appearance_ids[vi]),
                    chunk=eval_chunk,
                    mesh=eval_mesh,
                    attempts=3,
                )
                psnr_v = float(_metrics.psnr(
                    jnp.asarray(eval_ds.images[vi]), jnp.asarray(out["rgb"])
                ))
                if logger is not None:
                    logger.log(last, {"eval_psnr": psnr_v})
                print(f"[eval-image @ {last}] view {vi} psnr {psnr_v:.2f}")
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval-image @ {last}] SKIPPED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})")
        if ckpt_dir is not None and _covered(it + 1, cfg.steps_per_save, k_eff):
            from lsenerf_tpu.engine import checkpoints as ckpt_lib

            ckpt_lib.save_checkpoint(
                ckpt_dir, last, state.params, state.occ,
                opt_state=state.opt_state, rng=state.rng,
            )
        if eval_ds is not None and base_dir is not None and _covered(
            it + 1, cfg.steps_per_eval_all_images, k_eff
        ):
            from lsenerf_tpu.engine import evaluation

            try:
                means = with_tpu_retry(
                    evaluation.average_eval_metrics,
                    trainer, state, eval_ds, base_dir,
                    chunk=eval_chunk,
                    apply_cam_opt=apply_cam_opt,
                    evs_only=evs_only,
                    mesh=eval_mesh,
                    attempts=3,
                )
                print(f"[eval @ {last}] "
                      + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
            except Exception as e:  # noqa: BLE001 — keep training alive
                print(f"[eval @ {last}] SKIPPED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})")

    if ckpt_dir is not None:
        from lsenerf_tpu.engine import checkpoints as ckpt_lib

        ckpt_lib.save_checkpoint(
            ckpt_dir, end - 1, state.params, state.occ,
            opt_state=state.opt_state, rng=state.rng,
        )
    return state, metrics
