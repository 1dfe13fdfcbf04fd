"""Multi-step scan training path: equivalence with the single-step path."""

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
from lsenerf_tpu.data.synthetic import make_synthetic_scene
from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
from tests.test_train_e2e import tiny_model_config


def test_scan_matches_sequential_steps():
    col, evs = make_synthetic_scene(n_cams=6, h=24, w=24, focal=30.0)
    cfg = DataManagerConfig(train_num_rays_per_batch=128, rgb_frac=1.0)

    dm = MultiCamDataManager(cfg, col, None, seed=0)
    trainer = Trainer(TrainerConfig(), tiny_model_config(), dm)
    state_a = trainer.setup(jax.random.PRNGKey(0))
    state_b = jax.tree.map(jnp.copy, state_a)  # deep copy (donation-safe)

    k = 4
    stacked = dm.next_train_stack(0, k)
    batches = [
        {key: jnp.asarray(v[i]) for key, v in stacked.items()} for i in range(k)
    ]

    # sequential
    for b in batches:
        state_a, m_a = trainer._train_step(state_a, b)

    # scanned
    multi = trainer.make_train_step_multi(k)
    state_b, m_b = multi(state_b, {key: jnp.asarray(v) for key, v in stacked.items()})

    assert int(state_a.step) == int(state_b.step) == k
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    # Adam(eps=1e-15) turns ULP-level gradient reorderings (scan vs sequential
    # fusion) into +/-lr sign flips on near-zero-grad hash entries, so exact
    # param equality is not expected; require agreement at the update scale.
    lr = 1e-2
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for la, lb in zip(leaves_a, leaves_b):
        diff = np.abs(np.asarray(la) - np.asarray(lb))
        assert diff.max() <= 2 * k * lr + 1e-6
        assert diff.mean() <= lr


def test_camera_opt_metrics_present():
    from lsenerf_tpu.engine.trainer import CameraOptConfig

    col, evs = make_synthetic_scene(n_cams=6, h=24, w=24, focal=30.0)
    cfg = DataManagerConfig(train_num_rays_per_batch=128, rgb_frac=1.0)
    dm = MultiCamDataManager(cfg, col, None, seed=0)
    trainer = Trainer(
        TrainerConfig(col_cam_opt=CameraOptConfig(mode="SO3xR3")),
        tiny_model_config(), dm,
    )
    state = trainer.setup(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in dm.next_train(0).items()}
    _, metrics = trainer._train_step(state, batch)
    assert "camera_opt_translation_col" in metrics
    assert "camera_opt_rotation_col" in metrics
