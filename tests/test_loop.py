"""The consolidated training loop (engine/loop.py): cadence + observability.

Trainer.train() is a thin alias for run_training_loop — the SAME loop the CLI
drives — so these tests exercise production cadence logic directly.
"""

import jax
import jax.numpy as jnp

from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
from lsenerf_tpu.data.synthetic import make_synthetic_scene
from lsenerf_tpu.engine.trainer import CameraOptConfig, Trainer, TrainerConfig
from lsenerf_tpu.models import field as field_lib
from lsenerf_tpu.models import lsenerf as model_lib
from lsenerf_tpu.ops import hash_encoding as he
from lsenerf_tpu.ops import occupancy as occ_lib


def blocked_tiny_config():
    return model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            hash=he.HashEncodingConfig(
                num_levels=4, log2_hashmap_size=10, base_res=8, max_res=64,
                layout="blocked",
            ),
            use_contraction=False,
        ),
        grid=occ_lib.OccGridConfig(
            resolution=16, levels=1, aabb_scale=1.0, update_interval=8
        ),
        max_samples=16,
        max_candidates=64,
        far_plane=5.0,
        render_step_size=0.1,
    )


def test_overflow_sentinel_cadence():
    """grad_overflow_every=4: the loop logs the sentinel exactly on steps
    where (step+1) crosses a multiple of 4, and never otherwise."""
    col, _ = make_synthetic_scene(n_cams=4, h=16, w=16, focal=20.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0), col, None
    )
    trainer = Trainer(
        TrainerConfig(grad_overflow_every=4), blocked_tiny_config(), dm
    )
    state = trainer.setup(jax.random.PRNGKey(0))

    seen = {}
    state, _ = trainer.train(
        state, num_steps=10, log_every=1,
        callback=lambda step, scal: seen.update({step: "grad_overflow" in scal}),
    )
    fired = sorted(s for s, has in seen.items() if has)
    silent = sorted(s for s, has in seen.items() if not has)
    assert fired == [3, 7], (fired, silent)
    assert all((s + 1) % 4 != 0 for s in silent)
    assert int(state.step) == 10


def test_overflow_probe_none_for_ngp_layout():
    col, _ = make_synthetic_scene(n_cams=4, h=16, w=16, focal=20.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0), col, None
    )
    cfg = blocked_tiny_config()
    from dataclasses import replace

    ngp_cfg = replace(
        cfg, field=replace(cfg.field, hash=replace(cfg.field.hash, layout="ngp"))
    )
    trainer = Trainer(TrainerConfig(), ngp_cfg, dm)
    trainer.setup(jax.random.PRNGKey(0))
    assert trainer.make_overflow_probe() is None


def test_spline_drift_metrics_logged():
    """Spline runs (the headline protocol) must log knot drift + dM-scale
    deviation (reference logs the active optimizer's translation/rotation
    norms, lse_pipeline.py:134-142)."""
    col, evs = make_synthetic_scene(n_cams=6, h=16, w=16, focal=20.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=0.66), col, evs
    )
    trainer = Trainer(
        TrainerConfig(
            col_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="spline")
        ),
        blocked_tiny_config(),
        dm,
    )
    state = trainer.setup(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in dm.next_train(0).items()}
    _, metrics = trainer._train_step(state, batch)
    assert "camera_opt_translation_col" in metrics
    assert "camera_opt_rotation_col" in metrics
    assert "camera_opt_scale_drift_col" in metrics
    # drift is measured FROM the trajectory init, so step 0 reports ~0
    assert float(metrics["camera_opt_translation_col"]) < 1e-6
    assert float(metrics["camera_opt_scale_drift_col"]) < 1e-6


def test_prevnext_drift_metrics_logged():
    from dataclasses import replace as dc_replace

    col, evs = make_synthetic_scene(n_cams=6, h=16, w=16, focal=20.0)
    # synthetic scenes pair consecutive cameras; give the dataset explicit
    # prev/next pairs so the prevnext optimizer activates
    evs = dc_replace(evs, prev_cameras=evs.cameras, next_cameras=evs.cameras)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=0.66), col, evs
    )
    trainer = Trainer(
        TrainerConfig(
            evs_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="prevnext")
        ),
        blocked_tiny_config(),
        dm,
    )
    state = trainer.setup(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in dm.next_train(0).items()}
    _, metrics = trainer._train_step(state, batch)
    if "prev" in state.params["camera_opt"].get("evs", {}):
        assert "camera_opt_translation_evs_prev" in metrics
        assert "camera_opt_rotation_evs_next" in metrics


def test_annealed_proposal_phase_switch():
    """Annealed-F (proposal_warmup_steps): phase 1 trains with proposal off,
    the SAME TrainState then continues under the proposal-F trainer (state
    shapes are F-independent), and the step counter stays continuous."""
    import numpy as np
    from dataclasses import replace as dc_replace

    from lsenerf_tpu.engine.trainer import build_optimizer

    col, evs = make_synthetic_scene(n_cams=4, h=16, w=16, focal=20.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=0.66), col, evs
    )
    cfg_f = dc_replace(blocked_tiny_config(), proposal_samples=8)
    tcfg = TrainerConfig(
        col_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="ns"),
        evs_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="ns"),
    )
    trainer_f = Trainer(tcfg, cfg_f, dm)
    state = trainer_f.setup(jax.random.PRNGKey(0))

    # phase 1: proposal off (train.py's warm_trainer adoption pattern)
    warm = Trainer(tcfg, dc_replace(cfg_f, proposal_samples=0), dm)
    warm._tx = build_optimizer(tcfg, state.params)
    warm._train_step = warm.make_train_step()
    warm._occ_update = warm.make_occ_update()
    losses = []
    state, m = warm.train(
        state, num_steps=6, log_every=1,
        callback=lambda s, scal: losses.append(scal["loss"]),
    )
    assert int(state.step) == 6

    # phase 2: proposal-F continues from the same state
    state, m = trainer_f.train(
        state, num_steps=6, log_every=1,
        callback=lambda s, scal: losses.append(scal["loss"]),
    )
    assert int(state.step) == 12
    assert len(losses) == 12 and all(np.isfinite(l) for l in losses)
    # training across the switch made progress overall
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
