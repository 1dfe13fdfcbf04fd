"""Interactive viewer: orbit math, HTTP surface, render parity.

The viewer replaces the reference's (vestigial) nerfstudio viser viewer with
an HTTP orbit UI over the shared zero-recompile chunk renderer. These tests
drive the real server end-to-end on a tiny CPU scene.
"""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest

from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
from lsenerf_tpu.data.synthetic import make_synthetic_scene
from lsenerf_tpu.engine import renderer, viewer
from lsenerf_tpu.engine.trainer import Trainer, TrainerConfig

from test_train_e2e import tiny_model_config


@pytest.fixture(scope="module")
def session():
    col, evs = make_synthetic_scene(n_cams=6, h=24, w=32, focal=30.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=256), col, None
    )
    trainer = Trainer(TrainerConfig(), tiny_model_config(), dm)
    state = trainer.setup(jax.random.PRNGKey(0))
    state, _ = trainer.train(state, num_steps=20)
    return viewer.ViewerSession(
        state.params["model"], col.cameras, state.occ, trainer.model_config,
        resolutions=(16, 32), chunk=256,
    )


def test_scaled_cameras_preserve_fov():
    col, _ = make_synthetic_scene(n_cams=2, h=24, w=32, focal=30.0)
    small = viewer.scaled_cameras(col.cameras, 16)
    assert max(small.height, small.width) == 16
    # field of view preserved: w / fx invariant
    np.testing.assert_allclose(
        small.width / small.fx, col.cameras.width / col.cameras.fx, rtol=1e-2
    )
    np.testing.assert_allclose(
        small.cx / small.width, col.cameras.cx / col.cameras.width, rtol=0.1
    )


def test_orbit_c2w_roundtrip():
    """orbit_c2w produces a valid OpenGL c2w whose forward axis hits the
    target, and the JS fromC2w() recovery formulas (reimplemented here)
    invert it."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        theta = rng.uniform(-np.pi, np.pi)
        phi = rng.uniform(-1.4, 1.4)
        radius = rng.uniform(0.3, 5.0)
        target = rng.uniform(-1, 1, 3)
        m = viewer.orbit_c2w(theta, phi, radius, target)
        # orthonormal right-handed basis
        R = m[:, :3].astype(np.float64)
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0
        # camera looks at the target from distance radius (-z is forward)
        eye = m[:, 3]
        np.testing.assert_allclose(eye - radius * m[:, 2], target, atol=1e-5)
        # JS fromC2w: recover orbit params from the matrix
        z = m[:, 2]
        phi2 = np.arcsin(np.clip(z[2], -1, 1))
        theta2 = np.arctan2(z[1], z[0])
        np.testing.assert_allclose([theta2, phi2], [theta, phi], atol=1e-5)


def test_render_outputs_and_parity(session):
    c2w = session.init_c2w
    img = session.render(c2w, 32, "rgb")
    cams = session._cams[32]
    assert img.shape == (cams.height, cams.width, 3)
    assert img.dtype == np.uint8

    # parity with a direct render_image call through the same renderer
    direct = renderer.render_image(
        session.model_params, cams, 0, session.occ_state, session.config,
        appearance_id=session.appearance_id, chunk=session.chunk,
        c2w_override=np.asarray(c2w, np.float32),
    )
    want = (np.clip(direct["rgb"], 0, 1) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(img, want)

    for out in ("depth", "accumulation"):
        im = session.render(c2w, 16, out)
        small = session._cams[16]
        assert im.shape == (small.height, small.width, 3)

    with pytest.raises(ValueError):
        session.render(c2w, 16, "nope")


def test_http_surface(session):
    srv = viewer.make_server(session, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

        conn.request("GET", "/")
        r = conn.getresponse()
        page = r.read()
        assert r.status == 200 and b"lsenerf_tpu" in page

        conn.request("GET", "/info")
        r = conn.getresponse()
        info = json.loads(r.read())
        assert r.status == 200
        assert info["resolutions"] == [16, 32]
        assert np.asarray(info["init_c2w"]).shape == (3, 4)
        assert set(info["outputs"]) == set(viewer.ViewerSession.OUTPUTS)

        body = json.dumps({
            "c2w": info["init_c2w"], "max_dim": 16, "output": "rgb",
            "seq": 7,
        })
        conn.request("POST", "/render", body=body)
        r = conn.getresponse()
        jpg = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type") == "image/jpeg"
        assert r.getheader("X-Seq") == "7"
        assert float(r.getheader("X-Render-Ms")) > 0
        from PIL import Image

        im = Image.open(io.BytesIO(jpg))
        small = session._cams[16]
        assert im.size == (small.width, small.height)

        # malformed request -> 400, not a crash
        conn.request("POST", "/render", body="{bad json")
        r = conn.getresponse()
        r.read()
        assert r.status == 400

        conn.request("GET", "/nope")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
    finally:
        srv.shutdown()
        srv.server_close()
