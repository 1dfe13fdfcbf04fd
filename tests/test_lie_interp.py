"""Oracle tests for the differentiable pose math against scipy.

Mirrors the reference's only executable verification (SURVEY.md section 4):
slerp / tangent round-trips / full interpolation pipeline vs scipy
(interpolation_utils.py:392-457) plus gradient-existence checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation, Slerp

from lsenerf_tpu.ops import interp, lie


class SciSpline:
    """scipy-backed oracle (same role as reference interpolation_utils.py:330-344)."""

    def __init__(self, mats, ts):
        self.ts = ts
        self.rot_interp = Slerp(ts, Rotation.from_matrix(mats[:, :3, :3]))
        self.trans_interp = interp1d(ts, mats[:, :3, 3:], axis=0, kind="linear")

    def interpolate(self, ts):
        ts = np.clip(ts, self.ts[0] + 1e-6, self.ts[-1] - 1e-6)
        r, t = self.rot_interp(ts).as_matrix(), self.trans_interp(ts)
        return np.concatenate([r, t], axis=2)


def gen_data(n=10, max_t=10.0, seed=0):
    rng = np.random.default_rng(seed)
    rots = Rotation.random(n, random_state=int(seed)).as_matrix()
    trans = rng.random((n, 3, 1)) * 4
    mats = np.concatenate([rots, trans], axis=2).astype(np.float32)
    ts = np.arange(0, max_t, max_t / n).astype(np.float32)
    return ts, mats


def _quat_wxyz(mats):
    q = Rotation.from_matrix(mats[:, :3, :3]).as_quat()  # xyzw
    return np.concatenate([q[:, 3:], q[:, :3]], axis=1)


def test_slerp_vs_scipy():
    ts, mats = gen_data()
    interp_ts = np.arange(0, 10, 10 / 20).astype(np.float32)
    interp_ts = interp_ts[interp_ts <= ts.max()]

    quats = _quat_wxyz(mats)
    pose_map = np.concatenate([mats[:, :3, 3], quats], axis=1)

    out = interp.interpolate_pose_map(
        jnp.asarray(pose_map), jnp.asarray(ts), jnp.asarray(interp_ts)
    )
    got = np.asarray(lie.quat_map_to_mtx(out))
    want = SciSpline(mats, ts).interpolate(interp_ts)
    assert np.abs(got - want).max() < 1e-4


def test_tangent_roundtrip():
    _, mats = gen_data()
    tangents = lie.matrix_to_tangent_vector(jnp.asarray(mats))
    recovered = lie.exp_map_SO3xR3(tangents)
    assert np.abs(np.asarray(recovered) - mats).max() < 1e-4


def test_exp_quat_matrix_roundtrip():
    _, mats = gen_data()
    tangents = lie.matrix_to_tangent_vector(jnp.asarray(mats))
    recov = lie.quat_to_rot_mat(lie.exp_map_to_quat(tangents[:, 3:]))
    assert np.abs(np.asarray(recov) - mats[:, :3, :3]).max() < 1e-4


def test_exp_map_identity():
    # zero tangent -> identity pose
    out = np.asarray(lie.exp_map_SO3xR3(jnp.zeros((2, 6))))
    np.testing.assert_allclose(out, np.tile(np.eye(4)[None, :3, :4], (2, 1, 1)), atol=1e-4)
    out = np.asarray(lie.exp_map_SE3(jnp.zeros((2, 6))))
    np.testing.assert_allclose(out, np.tile(np.eye(4)[None, :3, :4], (2, 1, 1)), atol=1e-4)


def test_exp_map_SE3_vs_scipy():
    rng = np.random.default_rng(3)
    tang = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
    out = np.asarray(lie.exp_map_SE3(jnp.asarray(tang)))
    want_R = Rotation.from_rotvec(tang[:, 3:]).as_matrix()
    np.testing.assert_allclose(out[:, :3, :3], want_R, atol=1e-5)


def test_interpolate_c2w_pipeline_and_grads():
    ts, mats = gen_data()
    interp_ts = np.arange(0, 10, 10 / 20).astype(np.float32)[:5]
    tangents = lie.matrix_to_tangent_vector(jnp.asarray(mats))

    cams = interp.interpolate_c2w(tangents, jnp.asarray(ts), jnp.asarray(interp_ts))
    want = SciSpline(mats, ts).interpolate(interp_ts)
    assert np.abs(np.asarray(cams) - want).max() < 1e-4

    # gradient flows back to the control tangents (reference requirement:
    # interpolation_utils.py:455-457, ns_camera_optimizer.py:522-537)
    def loss(tg):
        c = interp.interpolate_c2w(tg, jnp.asarray(ts), jnp.asarray(interp_ts))
        return jnp.sum(c**2)

    g = jax.grad(loss)(tangents)
    assert bool(jnp.any(g != 0))
    assert not bool(jnp.any(jnp.isnan(g)))


def test_spline_learning_recovers_perturbation():
    """Perturbed control points optimize back toward ground truth
    (small-scale version of reference ns_camera_optimizer.py:540-598)."""
    import optax

    ts, mats = gen_data(n=6)
    interp_ts = np.linspace(0.3, 7.9, 16).astype(np.float32)
    gt_tang = lie.matrix_to_tangent_vector(jnp.asarray(mats))
    gt_cams = interp.interpolate_c2w(gt_tang, jnp.asarray(ts), jnp.asarray(interp_ts))

    rng = np.random.default_rng(1)
    pert = gt_tang + jnp.asarray(rng.normal(size=gt_tang.shape).astype(np.float32) * 0.05)

    tx = optax.adam(1e-3)

    @jax.jit
    def step(p, s):
        def loss(p):
            c = interp.interpolate_c2w(p, jnp.asarray(ts), jnp.asarray(interp_ts))
            return jnp.mean((c - gt_cams) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p, s = pert, tx.init(pert)
    first = None
    for i in range(400):
        p, s, l = step(p, s)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.1


def test_find_closest_idxs():
    ref = jnp.array([0.0, 1.0, 2.0, 5.0])
    q = jnp.array([-1.0, 0.4, 0.6, 3.4, 3.6, 9.0])
    got = np.asarray(interp.find_closest_idxs(ref, q))
    np.testing.assert_array_equal(got, [0, 0, 1, 2, 3, 3])


def test_find_closest_idxs_exclusive():
    ref = jnp.array([0.0, 1.0, 2.0, 5.0])
    q = jnp.array([1.0, 2.0])
    got = np.asarray(interp.find_closest_idxs_exclusive(ref, q))
    # interior exact matches resolve to a neighbor, not themselves (the
    # reference algorithm, data_components.py:32-67, only guarantees this away
    # from the array ends: at index 0 the clamped prev wins with distance 0)
    assert got[0] != 1 and got[1] != 2
