"""Tests for camera ray generation and pose optimizers."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from lsenerf_tpu.cameras import cameras as cam_lib
from lsenerf_tpu.cameras import pose_opt
from lsenerf_tpu.cameras.rays import RayBundle


def make_cams(n=3, distortion=None, times=None, seed=0):
    rng = np.random.default_rng(seed)
    rots = Rotation.random(n, random_state=seed).as_matrix()
    trans = rng.normal(size=(n, 3, 1))
    c2w = np.concatenate([rots, trans], axis=2).astype(np.float32)
    return cam_lib.Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48,
        distortion_params=distortion,
        times=times,
    )


def test_center_pixel_ray_is_optical_axis():
    cams = make_cams()
    # pixel exactly at the principal point -> direction = -z axis of the camera
    idx = jnp.array([0, 1, 2])
    coords = jnp.tile(jnp.array([[24.0, 32.0]]), (3, 1))  # (y, x) = (cy, cx)
    rb = cam_lib.generate_rays(cams, idx, coords)
    c2w = np.asarray(cams.camera_to_worlds)
    want_dir = -c2w[:, :3, 2]  # third column is camera z; view dir is -z
    want_dir /= np.linalg.norm(want_dir, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rb.directions), want_dir, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.origins), c2w[:, :3, 3], atol=1e-6)
    assert float(jnp.min(rb.pixel_area)) > 0


def test_no_half_pixel_offset():
    """Reference removes nerfstudio's 0.5-px offset (lse_cameras.py:69-73):
    integer pixel (cy, cx) maps exactly onto the optical axis."""
    cams = make_cams(n=1)
    rb = cam_lib.generate_rays(cams, jnp.array([0]), jnp.array([[24.0, 32.0]]))
    d_cam = np.asarray(cams.camera_to_worlds)[0, :3, :3].T @ np.asarray(rb.directions[0])
    np.testing.assert_allclose(d_cam, [0, 0, -1], atol=1e-6)


def test_ray_direction_math_matches_manual():
    cams = make_cams(n=1)
    y, x = 10.0, 50.0
    rb = cam_lib.generate_rays(cams, jnp.array([0]), jnp.array([[y, x]]))
    d_cam = np.array([(x - 32.0) / 100.0, -(y - 24.0) / 100.0, -1.0])
    R = np.asarray(cams.camera_to_worlds)[0, :3, :3]
    want = R @ d_cam
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(rb.directions[0]), want, atol=1e-5)


def _distort(coords, p):
    """Forward OpenCV distortion (oracle for the Newton inverse)."""
    k1, k2, k3, k4, p1, p2 = p
    x, y = coords[..., 0], coords[..., 1]
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    xd = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
    yd = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)
    return np.stack([xd, yd], axis=-1)


def test_undistort_inverts_distortion():
    p = np.array([0.03, -0.01, 0.002, 0.0, 0.001, -0.002], dtype=np.float32)
    rng = np.random.default_rng(0)
    undist = rng.uniform(-0.3, 0.3, size=(64, 2)).astype(np.float32)
    dist = _distort(undist, p)
    got = cam_lib.radial_and_tangential_undistort(jnp.asarray(dist), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(got), undist, atol=1e-5)


def test_pose_deltas_identity_and_translation():
    cams = make_cams()
    idx = jnp.array([0, 1, 2])
    coords = jnp.array([[5.0, 5.0], [10.0, 20.0], [40.0, 60.0]])
    rb = cam_lib.generate_rays(cams, idx, coords)

    params = pose_opt.init_pose_deltas(3)
    out = pose_opt.apply_pose_deltas_to_bundle(params, rb, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out.origins), np.asarray(rb.origins), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.directions), np.asarray(rb.directions), atol=1e-6)

    params = {"pose_adjustment": jnp.zeros((3, 6)).at[:, 0].set(0.5)}
    out = pose_opt.apply_pose_deltas_to_bundle(params, rb, jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(out.origins[:, 0]), np.asarray(rb.origins[:, 0]) + 0.5, atol=1e-5
    )


def test_delayed_activation_gates_value_and_grad():
    cams = make_cams()
    idx = jnp.array([0, 1, 2])
    coords = jnp.array([[5.0, 5.0], [10.0, 20.0], [40.0, 60.0]])
    rb = cam_lib.generate_rays(cams, idx, coords)
    params = {"pose_adjustment": jnp.full((3, 6), 0.1)}

    gate_off = pose_opt.activation_gate(jnp.int32(5), "delayed", 100)
    gate_on = pose_opt.activation_gate(jnp.int32(101), "delayed", 100)
    assert float(gate_off) == 0.0 and float(gate_on) == 1.0

    out_off = pose_opt.apply_pose_deltas_to_bundle(params, rb, gate_off)
    np.testing.assert_allclose(np.asarray(out_off.origins), np.asarray(rb.origins), atol=1e-6)

    def loss(p, gate):
        out = pose_opt.apply_pose_deltas_to_bundle(p, rb, gate)
        return jnp.sum(out.origins**2) + jnp.sum(out.directions**2)

    g_off = jax.grad(loss)(params, gate_off)["pose_adjustment"]
    g_on = jax.grad(loss)(params, gate_on)["pose_adjustment"]
    assert float(jnp.abs(g_off).max()) == 0.0
    assert float(jnp.abs(g_on).max()) > 0.0


def _make_trajectory(n=8, max_t=10.0):
    rng = np.random.default_rng(0)
    rots = Rotation.random(n, random_state=0).as_matrix()
    trans = rng.normal(size=(n, 3, 1)) * 2
    c2ws = np.concatenate([rots, trans], axis=2).astype(np.float32)
    ts = np.linspace(0, max_t, n).astype(np.float32)
    return c2ws, ts


def test_spline_reproduces_trajectory_at_knots():
    c2ws, ts = _make_trajectory()
    params, static = pose_opt.init_spline(c2ws, ts, control_pnt_factor=2)
    got = pose_opt.spline_rgb_c2w(params, static, jnp.asarray(ts), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(got), c2ws[:, :3, :4], atol=1e-4)


def test_spline_evs_applies_dM_and_scale():
    c2ws, ts = _make_trajectory()
    dM = np.eye(4, dtype=np.float32)
    dM[:3, 3] = [0.1, 0.0, 0.0]
    params, static = pose_opt.init_spline(c2ws, ts, dM=dM)
    rgb = pose_opt.spline_rgb_c2w(params, static, jnp.asarray(ts[:3]), jnp.float32(1.0))
    evs = pose_opt.spline_evs_c2w(params, static, jnp.asarray(ts[:3]), jnp.float32(1.0))
    want = np.einsum("nij,jk->nik", np.asarray(rgb)[:, :3, :3], dM[:3, :3])
    np.testing.assert_allclose(np.asarray(evs)[:, :3, :3], want, atol=1e-5)
    # baseline offset rides the rgb rotation
    want_t = np.asarray(rgb)[:, :3, 3] + np.asarray(rgb)[:, :3, :3] @ np.array([0.1, 0, 0])
    np.testing.assert_allclose(np.asarray(evs)[:, :3, 3], want_t, atol=1e-5)
    # scale parameter stretches the baseline
    params2 = dict(params, scale=jnp.full((1,), 2.0))
    evs2 = pose_opt.spline_evs_c2w(params2, static, jnp.asarray(ts[:3]), jnp.float32(1.0))
    want_t2 = np.asarray(rgb)[:, :3, 3] + np.asarray(rgb)[:, :3, :3] @ np.array([0.2, 0, 0])
    np.testing.assert_allclose(np.asarray(evs2)[:, :3, 3], want_t2, atol=1e-5)


def test_spline_deblur_shape_and_centering():
    c2ws, ts = _make_trajectory(max_t=100000.0)
    params, static = pose_opt.init_spline(c2ws, ts, exp_t=30000.0)
    cam_ts = jnp.asarray(ts[2:4])[:, None]
    out = pose_opt.spline_deblur_c2w(params, static, cam_ts, jnp.float32(1.0))
    assert out.shape == (2 * 4, 3, 4)
    # the 4 poses sample the window [t - exp_t/2, t + exp_t/2] at equal steps
    # (reference ns_camera_optimizer.py:183-191)
    t0 = float(cam_ts[0, 0])
    expect_ts = jnp.asarray([t0 - 15000, t0 - 5000, t0 + 5000, t0 + 15000])
    want = pose_opt.spline_rgb_c2w(params, static, expect_ts, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(want), atol=1e-5)


def test_spline_gradients_flow():
    c2ws, ts = _make_trajectory()
    params, static = pose_opt.init_spline(c2ws, ts)
    q = jnp.asarray(ts[:4] + 0.3)

    def loss(p):
        return jnp.sum(pose_opt.spline_rgb_c2w(p, static, q, jnp.float32(1.0)) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["ctrl_tangents"]).max()) > 0
    g0 = jax.grad(lambda p: jnp.sum(
        pose_opt.spline_rgb_c2w(p, static, q, jnp.float32(0.0)) ** 2
    ))(params)
    assert float(jnp.abs(g0["ctrl_tangents"]).max()) == 0.0


def test_prevnext_applies_independent_deltas():
    cams = make_cams()
    idx = jnp.array([0, 1, 2])
    coords = jnp.array([[5.0, 5.0], [10.0, 20.0], [40.0, 60.0]])
    prev_rb = cam_lib.generate_rays(cams, idx, coords)
    next_rb = cam_lib.generate_rays(cams, idx, coords)

    params = pose_opt.init_prevnext_deltas(3)
    params["prev"]["pose_adjustment"] = params["prev"]["pose_adjustment"].at[:, 1].set(0.3)
    p_out, n_out = pose_opt.apply_prevnext_to_bundles(
        params, prev_rb, next_rb, jnp.float32(1.0)
    )
    np.testing.assert_allclose(
        np.asarray(p_out.origins[:, 1]), np.asarray(prev_rb.origins[:, 1]) + 0.3, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(n_out.origins), np.asarray(next_rb.origins), atol=1e-6)
