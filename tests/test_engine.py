"""Tests for config CLI/YAML, checkpoints, writer, and the eval pipeline."""

import json
import os.path as osp

import jax
import numpy as np
import pytest

from lsenerf_tpu.engine import config as config_lib
from lsenerf_tpu.engine import checkpoints as ckpt_lib


def test_cli_dotted_flags():
    cfg = config_lib.parse_cli(
        [
            "lsenerf",
            "--max-num-iterations", "5000",
            "--pipeline.model.map-mode", "co_map",
            "--pipeline.model.evs-mapping-method", "powpow",
            "--pipeline.datamanager.rgb_frac", "0.5",
            "--pipeline.datamanager.col-cam-optimizer.mode", "SO3xR3",
            "--pipeline.datamanager.col-cam-optimizer.optim-type", "spline",
            "--optimizers.fields.optimizer.lr", "0.005",
            "--machine.seed", "96",
        ]
    )
    assert cfg.method_name == "lsenerf"
    assert cfg.max_num_iterations == 5000
    assert cfg.pipeline.model.map_mode == "co_map"
    assert cfg.pipeline.model.evs_mapping_method == "powpow"
    assert cfg.pipeline.datamanager.rgb_frac == 0.5
    assert cfg.pipeline.datamanager.col_cam_optimizer.mode == "SO3xR3"
    assert cfg.pipeline.datamanager.col_cam_optimizer.optim_type == "spline"
    assert cfg.optimizers.fields.optimizer.lr == 0.005
    assert cfg.machine.seed == 96


def test_config_yaml_roundtrip(tmp_path):
    cfg = config_lib.parse_cli(["lsenerf", "--pipeline.model.use-mapping", "True"])
    cfg.timestamp = "t0"
    path = str(tmp_path / "config.yml")
    config_lib.save_config(cfg, path)
    loaded = config_lib.load_config(path)
    assert loaded.pipeline.model.use_mapping is True
    assert loaded.timestamp == "t0"


def test_modify_config_deblur_forces_spline():
    cfg = config_lib.parse_cli(["lsenerf", "--pipeline.model.rgb-loss-type", "deblur"])
    cfg = config_lib.modify_config(cfg)
    assert cfg.pipeline.datamanager.rgb_loss_mode == "deblur"
    assert cfg.pipeline.datamanager.col_cam_optimizer.optim_type == "spline"


def test_modify_config_eval_reload(tmp_path):
    # save a train config, then load it in eval mode (reference train.py:237-304)
    train_cfg = config_lib.parse_cli(["lsenerf", "--pipeline.model.rgb-loss-type", "deblur"])
    train_cfg.timestamp = "t0"
    cfg_path = str(tmp_path / "run" / "config.yml")
    config_lib.save_config(train_cfg, cfg_path)

    eval_cfg = config_lib.parse_cli(
        [
            "lsenerf", "--is_eval", "True",
            "--load-config", cfg_path,
            "--load-dir", str(tmp_path / "run" / "checkpoints"),
            "--max-num-iterations", "6010",
        ]
    )
    out = config_lib.modify_config(eval_cfg)
    assert out.is_eval
    # eval forces plain mse + ns optimizer + SO3xR3 + rgb-only rays
    assert out.pipeline.model.rgb_loss_type == "linspace"
    assert out.pipeline.datamanager.col_cam_optimizer.mode == "SO3xR3"
    assert out.pipeline.datamanager.col_cam_optimizer.optim_type == "ns"
    assert out.pipeline.datamanager.rgb_frac == 1.0
    assert "_eval_zero" in out.method_name


def test_build_runtime_configs_modes():
    from lsenerf_tpu.engine.trainer import RunMode

    cfg = config_lib.parse_cli(["lsenerf"])
    tr, m, dmc, pc = config_lib.build_runtime_configs(cfg)
    assert tr.mode == RunMode.TRAIN
    cfg.is_eval = True
    tr, *_ = config_lib.build_runtime_configs(cfg)
    assert tr.mode == RunMode.EVAL
    cfg.do_pretrain = True
    tr, *_ = config_lib.build_runtime_configs(cfg)
    assert tr.mode == RunMode.PRETRAIN


def test_eval_modes_disable_proposal():
    """eval.sh / emb_eval.sh refinement stages are short frozen-field
    optimizations for eval quality: they must fit poses/embeddings through
    the FULL sampler, not the F-sample training renderer (quadrature
    mismatch vs the full-sampler final renders — measured emb_eval SSIM
    0.717 vs 0.776, PERFORMANCE.md round 5)."""
    cfg = config_lib.parse_cli(["lsenerf"])
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.proposal_samples == 16  # auto -> 16 for non-emb train
    cfg.is_eval = True
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.proposal_samples == 0
    cfg.is_eval = False
    cfg.do_pretrain = True
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.proposal_samples == 0
    # auto -> 0 for per-frame event-embedding configs (emb_eval golden
    # fails its gate at F=16: -0.52 dB / -0.058 SSIM) ...
    cfg = config_lib.parse_cli(
        ["lsenerf", "--pipeline.model.embed-config.embedding-type", "evs_emb"]
    )
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.proposal_samples == 0
    # ... while an explicit value is always honored
    cfg = config_lib.parse_cli(
        ["lsenerf", "--pipeline.model.embed-config.embedding-type", "evs_emb",
         "--pipeline.model.proposal-samples", "16"]
    )
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.proposal_samples == 16


def test_cli_defaults_match_bench_path():
    """A default train.py run must build the SAME compute path the published
    bench measures (blocked bf16 hash; packed/matmul march) — the CLI
    shipping reference-exact ngp/f32 instead was a measured 6.2x slowdown
    (scripts/probe_golden_bisect.py, round 3)."""
    cfg = config_lib.parse_cli(["lsenerf"])
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.field.compute_dtype == "bfloat16"
    assert m.field.hash.gather_dtype == "bfloat16"
    assert m.field.hash.layout == "blocked"
    assert m.supergrid_matmul and m.packed_phase2
    # the reference-exact numerics path stays one flag away
    cfg = config_lib.parse_cli(
        ["lsenerf", "--pipeline.model.compute-dtype", "float32",
         "--pipeline.model.hash-layout", "ngp"]
    )
    _, m, *_ = config_lib.build_runtime_configs(cfg)
    assert m.field.compute_dtype == "float32"
    assert m.field.hash.layout == "ngp"


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from lsenerf_tpu.ops import occupancy as occ_lib

    params = {
        "model": {"field": {"hash_table": jnp.ones((16, 2))}},
        "camera_opt": {"col": {"pose_adjustment": jnp.full((3, 6), 0.5)}},
    }
    occ = occ_lib.init_occ_grid(occ_lib.OccGridConfig(resolution=4, levels=1))
    d = str(tmp_path / "ckpts")
    ckpt_lib.save_checkpoint(d, 100, params, occ)
    ckpt_lib.save_checkpoint(d, 250, params, occ)
    assert ckpt_lib.latest_step(d) == 250

    step, loaded, occ_d = ckpt_lib.load_checkpoint(d)
    assert step == 250
    np.testing.assert_allclose(
        loaded["camera_opt"]["col"]["pose_adjustment"], 0.5
    )
    # eval-mode load strips learned cameras
    _, stripped, _ = ckpt_lib.load_checkpoint(d, strip_cameras=True)
    np.testing.assert_allclose(
        stripped["camera_opt"]["col"]["pose_adjustment"], 0.0
    )


def test_exact_resume_equivalence(tmp_path):
    """train N then M from a full checkpoint == train N+M straight
    (reference --load-checkpoint restores optimizers, lse_trainer.py:108-120)."""
    import jax.numpy as jnp

    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
    from tests.test_train_e2e import tiny_model_config

    col, evs = make_synthetic_scene(n_cams=4, h=16, w=16, focal=20.0)

    def make_trainer():
        dm = MultiCamDataManager(
            DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0),
            col, None, seed=3,
        )
        return Trainer(TrainerConfig(), tiny_model_config(), dm)

    trainer = make_trainer()
    state = trainer.setup(jax.random.PRNGKey(0))
    # fixed batch sequence shared by both runs (the datamanager stream is
    # host-side state the checkpoint doesn't own)
    batches = [
        {k: jnp.asarray(v) for k, v in trainer.dm.next_train(i).items()}
        for i in range(8)
    ]
    copy = lambda s: jax.tree.map(jnp.array, s)  # noqa: E731 — donated bufs

    def run(tr, s, bs, occ_at=()):
        for i, b in enumerate(bs):
            if i in occ_at:
                s = tr._occ_update(s)
            s, _ = tr._train_step(s, b)
        return s

    straight = run(trainer, copy(state), batches, occ_at=(0, 4))

    s_half = run(trainer, copy(state), batches[:4], occ_at=(0,))
    d = str(tmp_path / "ckpts")
    ckpt_lib.save_checkpoint(
        d, 3, s_half.params, s_half.occ,
        opt_state=s_half.opt_state, rng=s_half.rng,
    )

    trainer2 = make_trainer()
    state2 = trainer2.setup(jax.random.PRNGKey(99))  # different init on purpose
    step, params, occ, opt_leaves, rng = ckpt_lib.load_checkpoint_full(d)
    assert opt_leaves is not None and rng is not None
    resumed = ckpt_lib.restore_into_state(
        state2, params, occ, step, opt_leaves=opt_leaves, rng=rng
    )
    assert int(resumed.step) == 4
    resumed = run(trainer2, resumed, batches[4:], occ_at=(0,))

    flat_a = jax.tree.leaves(straight.params)
    flat_b = jax.tree.leaves(resumed.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # optimizer state (Adam moments + schedule counts) matches too
    for a, b in zip(
        jax.tree.leaves(straight.opt_state), jax.tree.leaves(resumed.opt_state)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # weights-only restore (the --load-dir path) keeps the fresh optimizer
    trainer3 = make_trainer()
    state3 = trainer3.setup(jax.random.PRNGKey(5))
    st3, p3, occ3 = ckpt_lib.load_checkpoint(d)
    weights_only = ckpt_lib.restore_into_state(state3, p3, occ3, st3)
    adam_mu = [
        np.asarray(x) for x in jax.tree.leaves(weights_only.opt_state)
        if hasattr(x, "shape") and x.ndim > 0
    ]
    assert all(np.allclose(m, 0) for m in adam_mu)


def test_writer_artifacts(tmp_path):
    from lsenerf_tpu.engine.writer import LSEWriter

    w = LSEWriter(str(tmp_path))
    imgs = {
        "img": np.random.rand(8, 16, 3),
        "depth": np.random.rand(8, 16, 3),
        "accumulation": np.random.rand(8, 16, 1),  # skipped
    }
    w.log_images(imgs)
    assert osp.exists(tmp_path / "eval_results" / "img" / "000.png")
    assert osp.exists(tmp_path / "eval_results" / "comb_imgs" / "000.png")
    assert not osp.exists(tmp_path / "eval_results" / "accumulation")

    means = w.log_metrics([{"psnr": 20.0, "ssim": 0.8}, {"psnr": 22.0, "ssim": 0.9}])
    assert means["psnr"] == 21.0
    data = json.load(open(tmp_path / "eval_metrics.json"))
    assert data["psnr"] == [20.0, 22.0]

    # mapper plot
    from lsenerf_tpu.models import mappers

    p = mappers.init_mapper("powpow", jax.random.PRNGKey(0))
    path = w.plt_mapper("powpow", p, "evs", gt_fn=None)
    assert osp.exists(path)


def test_cli_end_to_end_synthetic(tmp_path, monkeypatch):
    """Smoke the real CLI on the synthetic scene for a few steps."""
    import train as train_cli

    monkeypatch.chdir(tmp_path)
    train_cli.main(
        [
            "lsenerf",
            "--data", "synthetic",
            "--max-num-iterations", "6",
            "--steps-per-save", "5",
            "--steps-per-eval-batch", "3",
            "--steps-per-eval-all-images", "100000",
            "--pipeline.datamanager.train_num_rays_per_batch", "64",
            "--pipeline.datamanager.rgb_frac", "1.0",
            "--pipeline.model.num-levels", "4",
            "--pipeline.model.log2-hashmap-size", "10",
            "--pipeline.model.max-res", "64",
            "--pipeline.model.grid-resolution", "16",
            "--pipeline.model.grid-levels", "1",
            "--pipeline.model.max-samples", "16",
            "--pipeline.model.max-candidates", "64",
            "--output-dir", str(tmp_path / "out"),
        ]
    )
    runs = list((tmp_path / "out").rglob("config.yml"))
    assert len(runs) == 1
    ckpts = list((tmp_path / "out").rglob("step-*"))
    assert ckpts


def test_evaluation_pipeline(tmp_path):
    """Eval loop writes metrics + artifacts for a tiny trained model."""
    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine import evaluation
    from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
    from tests.test_train_e2e import tiny_model_config

    col, evs = make_synthetic_scene(n_cams=4, h=24, w=24, focal=30.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=128, rgb_frac=1.0), col, None
    )
    trainer = Trainer(TrainerConfig(), tiny_model_config(), dm)
    state = trainer.setup(jax.random.PRNGKey(0))
    state, _ = trainer.train(state, num_steps=10)

    means = evaluation.average_eval_metrics(
        trainer, state, col, str(tmp_path), chunk=576
    )
    assert "psnr" in means and "num_rays_per_sec" in means
    assert osp.exists(tmp_path / "eval_mean.json")
    assert osp.exists(tmp_path / "eval_results" / "img" / "000.png")
    assert osp.exists(tmp_path / "eval_results" / "overlay" / "003.png")
    assert osp.exists(tmp_path / "commit_hash.txt")
