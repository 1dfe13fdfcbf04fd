"""Round-trip tests for the on-disk LSENeRF-formatter parser using generated
fixtures in the exact reference layout."""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from lsenerf_tpu.data.parser import ParserConfig, SceneParser, cv_to_working


def make_scene_dir(tmp, n=6, h=12, w=16, with_prevnext=False, with_relcam=True):
    rng = np.random.default_rng(0)
    rots = Rotation.random(n, random_state=0).as_matrix()
    positions = rng.normal(size=(n, 3))

    def write_cam_dir(cam_dir, jitter=0.0):
        os.makedirs(cam_dir, exist_ok=True)
        for i in range(n):
            data = {
                "orientation": rots[i].tolist(),
                "position": (positions[i] + jitter).tolist(),
                "focal_length": 50.0,
                "principal_point": [w / 2, h / 2],
                "image_size": [w, h],
                "radial_distortion": [0.01, -0.002, 0.0],
                "tangential_distortion": [0.001, 0.0],
                "t": float(i * 1000),
            }
            with open(osp.join(cam_dir, f"{i:06d}.json"), "w") as f:
                json.dump(data, f)

    col = osp.join(tmp, "colcam_set")
    evs = osp.join(tmp, "ecam_set")
    write_cam_dir(osp.join(col, "camera"))
    write_cam_dir(osp.join(evs, "camera"), jitter=0.01)
    if with_prevnext:
        write_cam_dir(osp.join(evs, "prev_camera"), jitter=0.01)
        write_cam_dir(osp.join(evs, "next_camera"), jitter=0.02)

    os.makedirs(osp.join(col, "rgb", "1x"))
    imgs = (rng.uniform(size=(n, h, w, 3)) * 255).astype(np.uint8)
    for i in range(n):
        Image.fromarray(imgs[i]).save(osp.join(col, "rgb", "1x", f"{i:06d}.png"))

    meta = {str(i): {"appearance_id": i} for i in range(n)}
    if with_relcam:
        meta["colmap_scale"] = 0.5
    for d in (col, evs):
        with open(osp.join(d, "metadata.json"), "w") as f:
            json.dump(meta, f)

    with open(osp.join(col, "dataset.json"), "w") as f:
        json.dump(
            {"train_ids": [0, 1, 2, 3], "val_ids": [4], "half_train_ids": [0, 2]}, f
        )
    with open(osp.join(evs, "dataset.json"), "w") as f:
        json.dump({"train_ids": list(range(n - 1))}, f)
    with open(osp.join(evs, "scene.json"), "w") as f:
        json.dump({"e_thresh": 0.25}, f)

    os.makedirs(osp.join(evs, "eimgs"))
    eimgs = rng.integers(-5, 5, size=(n - 1, h, w)).astype(np.int16)
    np.save(osp.join(evs, "eimgs", "eimgs_1x.npy"), eimgs)

    if with_relcam:
        rel = {
            "R": Rotation.random(random_state=9).as_matrix().tolist(),
            "T": [0.1, 0.02, -0.05],
        }
        with open(osp.join(tmp, "rel_cam.json"), "w") as f:
            json.dump(rel, f)
    return tmp, imgs, eimgs


def test_cv_to_working_roundtrip():
    R = Rotation.random(random_state=0).as_matrix()
    t = np.array([0.5, -0.2, 1.0])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    c2w = cv_to_working(w2c)
    # camera center: -R^T t, preserved
    np.testing.assert_allclose(c2w[:3, 3], -R.T @ t, atol=1e-8)
    # gl c2w rotation columns: [right, -up, -forward] transposed of cv rows
    np.testing.assert_allclose(c2w[:3, :3], np.stack([R[0], -R[1], -R[2]]).T, atol=1e-8)


def test_parse_color_train(tmp_path):
    root, imgs, _ = make_scene_dir(str(tmp_path))
    parser = SceneParser(root, ParserConfig(scale_factor=2.0))
    ds = parser.parse_color("train")
    # train_ids [0,1,2,3], all < n_imgs-1=5
    assert len(ds) == 4
    assert ds.cameras.width == 16 and ds.cameras.height == 12
    np.testing.assert_allclose(
        ds.images[1], imgs[1].astype(np.float32) / 255.0, atol=1e-6
    )
    np.testing.assert_array_equal(ds.appearance_ids, [0, 1, 2, 3])
    assert ds.cameras.distortion_params is not None
    assert ds.dM is not None and ds.dM.shape == (4, 4)
    # scale_factor applied to translations
    p0 = np.asarray(ds.cameras.camera_to_worlds)[0, :3, 3]
    parser1 = SceneParser(root, ParserConfig(scale_factor=1.0))
    p0_unscaled = np.asarray(
        parser1.parse_color("train").cameras.camera_to_worlds
    )[0, :3, 3]
    np.testing.assert_allclose(p0, 2.0 * p0_unscaled, atol=1e-6)


def test_parse_color_eval_split_swap(tmp_path):
    root, _, _ = make_scene_dir(str(tmp_path))
    parser = SceneParser(root)
    # eval-mode training uses half_train_ids when present
    ds = parser.parse_color("train", is_eval=True)
    np.testing.assert_array_equal(ds.data_idxs, [0, 2])
    # val split
    ds_val = parser.parse_color("val")
    np.testing.assert_array_equal(ds_val.data_idxs, [4])


def test_quality_image_type_dir_selection(tmp_path):
    """Train reads <quality>_<image_type>_colcam_set when present; eval/val
    stay on the clear variant (reference lse_parser.py:393-412)."""
    import shutil

    root, imgs, _ = make_scene_dir(str(tmp_path))
    blur_dir = osp.join(root, "blur_gamma_colcam_set")
    shutil.copytree(osp.join(root, "colcam_set"), blur_dir)
    # make the blur variant distinguishable
    blur_img = np.zeros_like(imgs[0])
    Image.fromarray(blur_img).save(osp.join(blur_dir, "rgb", "1x", "000000.png"))

    parser = SceneParser(root, ParserConfig(quality="blur", image_type="gamma"))
    ds = parser.parse_color("train")
    np.testing.assert_allclose(ds.images[0], 0.0)  # read from the blur dir
    ds_val = parser.parse_color("val")  # val forces quality="clear" -> default
    np.testing.assert_allclose(
        ds_val.images[0], imgs[4].astype(np.float32) / 255.0, atol=1e-6
    )
    # requesting a variant that does not exist falls back to colcam_set
    parser2 = SceneParser(root, ParserConfig(quality="foggy", image_type="gamma"))
    ds2 = parser2.parse_color("train")
    np.testing.assert_allclose(
        ds2.images[0], imgs[0].astype(np.float32) / 255.0, atol=1e-6
    )


def test_parse_events(tmp_path):
    root, _, eimgs = make_scene_dir(str(tmp_path))
    parser = SceneParser(root)
    ds = parser.parse_events()
    assert ds.e_thresh == 0.25
    assert ds.eimgs.shape == (5, 12, 16, 1)
    v = ds.get_scaled((np.array([0]), np.array([3]), np.array([5])))
    np.testing.assert_allclose(v, eimgs[0, 3, 5] * 0.25, atol=1e-6)
    assert ds.prev_cameras is None
    # e_thresh override
    ds2 = SceneParser(root, ParserConfig(e_thresh=0.5)).parse_events()
    assert ds2.e_thresh == 0.5


def test_parse_events_prevnext(tmp_path):
    root, _, _ = make_scene_dir(str(tmp_path), with_prevnext=True)
    ds = SceneParser(root).parse_events()
    assert ds.prev_cameras is not None and ds.next_cameras is not None
    assert len(ds.prev_cameras) == 5  # train_ids 0..4


def test_color_train_ts_and_max_app(tmp_path):
    root, _, _ = make_scene_dir(str(tmp_path))
    parser = SceneParser(root)
    ts = parser.color_train_ts()
    np.testing.assert_allclose(ts, [0.0, 1000.0, 2000.0, 3000.0])
    assert parser.max_appearance_id() == 6


def test_spline_knots_use_full_trajectory(tmp_path):
    # Reference builds spline control points from get_all_cameras (the full
    # trajectory, lse_datamanager.py:288-291), not the train split. With the
    # 6-camera fixture (train_ids [0..3]), all_color_cameras() drops only the
    # last json -> 5 knots at t = 0..4000; the train split alone would give 4.
    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.engine.trainer import CameraOptConfig, Trainer, TrainerConfig

    root, _, _ = make_scene_dir(str(tmp_path))
    sp = SceneParser(root)
    col = sp.parse_color("train")
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=32, rgb_frac=1.0), col, None
    )
    tr_cfg = TrainerConfig(
        col_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="spline")
    )
    from lsenerf_tpu.models import lsenerf as model_lib

    all_cams = sp.all_color_cameras()
    trainer = Trainer(tr_cfg, model_lib.ModelConfig(), dm, all_cameras=all_cams)
    np.testing.assert_allclose(
        trainer.col_spline_static.ctrl_ts, [0.0, 1000.0, 2000.0, 3000.0, 4000.0]
    )
    # fallback: without all_cameras the knots cover only the train split
    trainer_trainsplit = Trainer(tr_cfg, model_lib.ModelConfig(), dm)
    assert len(trainer_trainsplit.col_spline_static.ctrl_ts) == 4


def test_write_reference_scene_real_scale_options(tmp_path):
    """write_reference_scene with prev/next cameras, masks, and a dense
    full_camera trajectory round-trips through the parser (the real-scale
    golden profile, scripts/golden_real_scale.py)."""
    from lsenerf_tpu.data.synthetic import write_reference_scene

    root = str(tmp_path / "scene")
    write_reference_scene(
        root, n_cams=8, h=12, w=16, focal=20.0, n_val=2,
        with_prevnext=True, with_msk=True, with_full_camera=True,
    )
    parser = SceneParser(root)
    col = parser.parse_color("train")
    assert col.msk is not None
    evs = parser.parse_events()
    # explicit prev/next pairing was parsed
    assert evs.prev_cameras is not None and evs.next_cameras is not None
    assert len(evs.prev_cameras) == len(evs.next_cameras)
    # next camera i == prev camera i+1 (both are trajectory pose i+1)
    np.testing.assert_allclose(
        np.asarray(evs.next_cameras.camera_to_worlds[0]),
        np.asarray(evs.prev_cameras.camera_to_worlds[1]),
        atol=2e-4,
    )
    # full_camera is denser than the frame trajectory
    full = parser.all_color_cameras()
    assert len(full) == 16


def test_parse_events_is_memmap_lazy(tmp_path):
    # Event frames must stay on disk through batch gathers (VGA >1000-frame
    # sets are multi-GB); parse_events returns a LazyFrameArray over the
    # memmapped .npy rather than a materialized stack.
    from lsenerf_tpu.data.dataset import LazyFrameArray

    root, _, eimgs = make_scene_dir(str(tmp_path))
    ds = SceneParser(root).parse_events()
    assert isinstance(ds.eimgs, LazyFrameArray)
    assert isinstance(ds.eimgs.src, np.memmap)
    assert ds.eimgs.shape == (5, 12, 16, 1)
    # batch-style tuple gather matches the eager values
    rng = np.random.default_rng(0)
    c = rng.integers(0, 5, size=32)
    y = rng.integers(0, 12, size=32)
    x = rng.integers(0, 16, size=32)
    np.testing.assert_allclose(
        ds.get_scaled((c, y, x))[:, 0], eimgs[c, y, x] * 0.25, atol=1e-6
    )
    # full materialization (native prefetcher path) round-trips
    np.testing.assert_array_equal(np.asarray(ds.eimgs)[..., 0], eimgs)


def test_lazy_frame_array_long_recording_drop():
    # EventFrameDataset.__post_init__ drops the last 8 frames of >1000-frame
    # recordings by slicing; the lazy view must honor that without copying.
    from lsenerf_tpu.data.dataset import EventFrameDataset, LazyFrameArray

    src = np.arange(1200 * 2 * 2, dtype=np.int16).reshape(1200, 2, 2)
    lazy = LazyFrameArray(src, np.arange(1200))
    ds = EventFrameDataset(
        eimgs=lazy, cameras=None, e_thresh=0.1,
        appearance_ids=np.zeros(1200, np.int32),
    )
    assert isinstance(ds.eimgs, LazyFrameArray)
    assert len(ds) == 1192
    np.testing.assert_allclose(
        ds.get_scaled((np.array([1191]), np.array([1]), np.array([1])))[:, 0],
        src[1191, 1, 1] * 0.1,
        rtol=1e-6,
    )


def test_real_scale_scene_event_targets_are_realistic(tmp_path):
    """The textured real-scale scene writes event targets at real
    event-camera magnitude (|delta log| ~0.1+), not at noise level.

    Regression for the golden-run powpow collapse: a smooth sphere at the
    200-frame orbit's 1.35 deg/frame produced q90 |delta log| ~ 7e-3, so the
    adaptive threshold wrote near-zero-information events, the optimal
    powpow exponent was ~0, and x**(c-1) gradients at the 1e-5 clamp floor
    destabilized training. The golden profile (scripts/golden_real_scale.py)
    uses texture_freq=24; angular step is what sets the delta magnitude, so
    this test keeps the 200-camera orbit but shrinks the image."""
    from lsenerf_tpu.data.synthetic import write_reference_scene

    root = str(tmp_path / "scene")
    write_reference_scene(
        root, n_cams=200, h=60, w=80, focal=0.9 * 80, n_val=4,
        with_prevnext=True, texture_freq=24.0,
    )
    with open(osp.join(root, "ecam_set", "scene.json")) as f:
        e_eff = json.load(f)["e_thresh"]
    counts = np.load(osp.join(root, "ecam_set", "eimgs", "eimgs_1x.npy"))
    # the requested contrast threshold (0.2) held — no vacuous-event fallback
    assert e_eff == pytest.approx(0.2)
    tgt = counts.astype(np.float32) * e_eff
    nz = counts != 0
    assert nz.mean() > 0.05, "event supervision must cover >5% of pixels"
    assert np.abs(tgt[nz]).mean() >= 0.2, "per-event magnitude at threshold scale"
