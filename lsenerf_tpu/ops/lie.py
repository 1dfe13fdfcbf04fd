"""Differentiable Lie-group / rotation math on batched arrays.

Capability parity targets (behavior, not code) from the reference:
  - nerfstudio `exp_map_SO3xR3` / `exp_map_SE3` used at ns_camera_optimizer.py:274-277
  - `matrix_to_tangent_vector`, `hom_exp_map_SO3xR3`, `exp_map_to_quat`,
    `quat_to_rot_mat` from interpolation_utils.py:14-246

All functions are pure jnp, batched over the leading axis, and safe under jit/vmap.
Tangent convention: 6-vector = [translation(3), so3 log-rotation(3)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-float32 batched matmul for geometry math.

    JAX's default matmul precision trades mantissa bits for MXU throughput
    (bf16-equivalent), which is the right call for the neural nets but loses
    ~1e-3 on pose compositions. All pose/ray matmuls in the framework go
    through this HIGHEST-precision helper; tensors here are tiny (3x3/3x4), so
    the cost is irrelevant.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Batched skew-symmetric matrix from (..., 3) vectors."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """Exponential map of SO(3) x R^3: translation passes through untouched.

    Args:
        tangent: (..., 6) = [t(3), log_rot(3)]
    Returns:
        (..., 3, 4) [R | t] matrices.

    Mirrors the angle clamp (min squared-norm 1e-4 before sqrt) used by the
    reference's hom_exp_map_SO3xR3 (interpolation_utils.py:132-168) so tiny
    rotations stay differentiable without NaNs.
    """
    t = tangent[..., :3]
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, min=1e-4))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    s = skew(log_rot)
    s2 = mm(s, s)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), s.shape)
    R = fac1[..., None, None] * s + fac2[..., None, None] * s2 + eye
    return jnp.concatenate([R, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """Exponential map of SE(3) (translation twisted by the V matrix).

    Args:
        tangent: (..., 6) = [rho(3), log_rot(3)]
    Returns:
        (..., 3, 4) [R | V rho].
    """
    rho = tangent[..., :3]
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(jnp.clip(nrms, min=1e-10))
    s = skew(log_rot)
    s2 = mm(s, s)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), s.shape)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    fac1 = sin_t / theta
    fac2 = (1.0 - cos_t) / (theta * theta)
    fac3 = (theta - sin_t) / (theta**3)
    # guard tiny angles with series limits
    small = nrms < 1e-8
    fac1 = jnp.where(small, 1.0 - nrms / 6.0, fac1)
    fac2 = jnp.where(small, 0.5 - nrms / 24.0, fac2)
    fac3 = jnp.where(small, 1.0 / 6.0 - nrms / 120.0, fac3)
    R = fac1[..., None, None] * s + fac2[..., None, None] * s2 + eye
    V = eye + fac2[..., None, None] * s + fac3[..., None, None] * s2
    t = mm(V, rho[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def matrix_to_tangent_vector(matrix) -> jnp.ndarray:
    """(..., 4, 4) or (..., 3, 4) homogeneous transform -> (..., 6) [t, so3].

    Init-time-only helper (building spline control points from camera matrices,
    reference interpolation_utils.py:14-53 / ns_camera_optimizer.py:101-128):
    computed host-side in float64 numpy, because float32 trace/axis extraction
    loses several digits near 180-degree rotations. Not differentiable — the
    learnable path is the forward exp map, never this log map.
    """
    import numpy as np

    m = np.asarray(matrix, dtype=np.float64)
    t = m[..., :3, 3]
    R = m[..., :3, :3]
    trace = np.trace(R, axis1=-2, axis2=-1)
    cos_angle = np.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = np.arccos(cos_angle)
    axis_raw = np.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_angle = np.sin(angle)
    small = np.abs(sin_angle) < 1e-8
    near_pi = small & (cos_angle < 0)
    denom = np.where(small, 1.0, 2.0 * sin_angle)
    axis = axis_raw / denom[..., None]
    # angle ~ 0: arbitrary axis (reference defaults to +z)
    axis = np.where(
        (small & ~near_pi)[..., None], np.array([0.0, 0.0, 1.0]), axis
    )
    # angle ~ pi: axis from the symmetric part, R = 2*nn^T - I
    if np.any(near_pi):
        diag = np.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
        n = np.sqrt(np.clip((diag + 1.0) / 2.0, 0.0, None))
        # fix signs from off-diagonals using the largest component
        k = np.argmax(n, axis=-1)
        for idx in np.argwhere(near_pi):
            i = tuple(idx)
            kk = k[i]
            nn = n[i].copy()
            others = [j for j in range(3) if j != kk]
            for j in others:
                s = R[i][kk, j] + R[i][j, kk]
                nn[j] = np.sign(s) * abs(nn[j]) if abs(s) > 1e-12 else nn[j]
            axis[i] = nn / np.linalg.norm(nn)
    so3 = axis * angle[..., None]
    return jnp.asarray(
        np.concatenate([t, so3], axis=-1).astype(np.float32)
    )


def exp_map_to_quat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) so(3) log-rotation -> (..., 4) quaternion [w, x, y, z].

    Zero-rotation rows map to the identity quaternion (reference
    interpolation_utils.py:172-200 semantics).
    """
    thetas = jnp.linalg.norm(v, axis=-1)
    valid = thetas > 0
    safe_thetas = jnp.where(valid, thetas, 1.0)
    n = v / safe_thetas[..., None]
    w = jnp.cos(thetas / 2.0)
    sin_half = jnp.sin(thetas / 2.0)
    xyz = jnp.where(valid[..., None], n * sin_half[..., None], jnp.zeros_like(v))
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_to_rot_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [w, x, y, z] quaternion -> (..., 3, 3) rotation matrix.

    Matches reference interpolation_utils.py:204-237 (no renormalization; callers
    feed normalized-enough quaternions, including slerp's near-zero lerp branch).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp_map_to_quat_map(exp_map: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [t, so3] -> (..., 7) [t, quat(wxyz)]."""
    return jnp.concatenate(
        [exp_map[..., :3], exp_map_to_quat(exp_map[..., 3:])], axis=-1
    )


def quat_map_to_mtx(quat_map: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) [t, quat] -> (..., 3, 4) [R | t]."""
    rot = quat_to_rot_mat(quat_map[..., 3:])
    return jnp.concatenate([rot, quat_map[..., :3, None]], axis=-1)


def multiply_poses(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose (..., 3, 4) poses: result = a @ [b; 0 0 0 1]."""
    R = mm(a[..., :3, :3], b[..., :3, :3])
    t = mm(a[..., :3, :3], b[..., :3, 3:]) + a[..., :3, 3:]
    return jnp.concatenate([R, t], axis=-1)


def to_homogeneous(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) with bottom row [0, 0, 0, 1]."""
    bottom = jnp.zeros_like(pose[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)
