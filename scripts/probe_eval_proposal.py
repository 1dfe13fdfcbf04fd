"""Re-eval a finished eval.sh-stage run with a different RENDER-time sampler.

The proposal resampler (ops/march.py:482) applies at eval renders too, while
the reference evaluates EVERY occupied sample at eval (nerfacc sampling,
lse_grid_estimator.py:93-143). This probe separates render-time quadrature
from trained-model quality: load the refined checkpoint of an eval.sh-stage
run unchanged (cameras kept) and run the full-image eval with
--proposal-samples overridden (0 = all max_samples occupancy slots).

    python scripts/probe_eval_proposal.py <evalsh_run_dir> [F]

Prints the eval means; compare against the run's own eval_mean.json
(rendered at the training F).
"""

import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(run_dir: str, f_override: int = 0, out_dir: str = None):
    import jax

    from lsenerf_tpu.data.datamanager import MultiCamDataManager
    from lsenerf_tpu.engine import checkpoints as ckpt_lib
    from lsenerf_tpu.engine import config as config_lib
    from lsenerf_tpu.engine import evaluation
    from lsenerf_tpu.engine.trainer import Trainer
    from lsenerf_tpu.utils.tpu_retry import with_tpu_retry
    from train import build_datasets

    out_dir = out_dir or osp.join(run_dir, f"eval_proposal_{f_override}")
    # the saved config.yml is already post-modify_config surgery; reload it
    # verbatim and override only the render-time sampler knob (the
    # load-config override whitelist deliberately excludes model fields)
    config = config_lib.load_config(osp.join(run_dir, "config.yml"))
    config.pipeline.model.proposal_samples = f_override
    trainer_cfg, model_cfg, dm_cfg, parser_cfg = (
        config_lib.build_runtime_configs(config)
    )
    assert model_cfg.proposal_samples == f_override, (
        model_cfg.proposal_samples
    )
    col, evs, eval_ds, sp = build_datasets(config, parser_cfg)
    dm = MultiCamDataManager(dm_cfg, col, evs, seed=config.machine.seed)
    trainer = Trainer(trainer_cfg, model_cfg, dm, eval_dataset=eval_ds)
    state = trainer.setup(jax.random.PRNGKey(config.machine.seed))
    # full restore, cameras KEPT (the refined deltas are the point)
    step, params, occ, opt_leaves, rng = ckpt_lib.load_checkpoint_full(
        osp.join(run_dir, "checkpoints")
    )
    state = ckpt_lib.restore_into_state(state, params, occ, step)
    print(f"[probe] restored step {step}; rendering at "
          f"proposal_samples={f_override}", flush=True)
    means = with_tpu_retry(
        evaluation.average_eval_metrics,
        trainer, state, eval_ds, out_dir,
        chunk=config.pipeline.model.eval_num_rays_per_chunk,
        apply_cam_opt=True,
        attempts=3,
    )
    print("[probe] " + json.dumps(means), flush=True)
    return means


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 0)
