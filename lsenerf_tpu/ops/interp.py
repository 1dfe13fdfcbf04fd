"""Differentiable continuous-time pose interpolation (the camera spline core).

Behavior parity with reference interpolation_utils.py:56-128 (batched slerp with
near-0/near-180-degree handling, searchsorted + lerp/slerp pose interpolation) and
data_components.py:5-67 (nearest-timestamp index lookup). Pure jnp; jit/vmap safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from lsenerf_tpu import EPS
from lsenerf_tpu.ops import lie


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Batched quaternion slerp.

    Args:
        v0: (n, 4) start quaternions.
        v1: (n, 4) end quaternions.
        t:  (n, 1) interpolation fractions in [0, 1].
    Returns:
        (n, 4) interpolated quaternions.

    Matches reference semantics (interpolation_utils.py:56-99): dot clamped to
    (-1+EPS, 1-EPS), shortest-path sign flip, linear interpolation fallback when
    |dot| > 0.9995 (near-identical rotations), sin-ratio formula otherwise.
    """
    v0n = v0 / jnp.linalg.norm(v0, axis=1, keepdims=True)
    v1n = v1 / jnp.linalg.norm(v1, axis=1, keepdims=True)

    dot = jnp.clip(jnp.sum(v0n * v1n, axis=1, keepdims=True), -1.0 + EPS, 1.0 - EPS)
    dot_neg = dot < 0
    v1n = jnp.where(dot_neg, -v1n, v1n)
    dot = jnp.where(dot_neg, -dot, dot)
    dot_mag = jnp.abs(dot)

    is_near_zero = jnp.isnan(dot_mag) | (dot_mag > 0.9995)
    linear_rot = (1 - t) * v0n + t * v1n

    theta_0 = jnp.arccos(dot)
    theta_t = theta_0 * t
    sin_theta_t = jnp.sin(theta_t)
    sin_theta_0 = jnp.sin(theta_0)
    sin_theta_0 = jnp.where(sin_theta_0 == 0, jnp.ones_like(sin_theta_0), sin_theta_0)
    s0 = jnp.sin(theta_0 - theta_t) / sin_theta_0
    s1 = sin_theta_t / sin_theta_0
    slerp_rot = s0 * v0n + s1 * v1n

    return jnp.where(jnp.broadcast_to(is_near_zero, slerp_rot.shape), linear_rot, slerp_rot)


def interpolate_pose_map(
    control_poses: jnp.ndarray, control_ts: jnp.ndarray, interp_ts: jnp.ndarray
) -> jnp.ndarray:
    """Piecewise lerp (translation) + slerp (rotation) along a pose trajectory.

    Args:
        control_poses: (m, 7) [t(3), quat(4)] control knots.
        control_ts:    (m,) strictly increasing knot times.
        interp_ts:     (k,) query times (callers clip to the knot range).
    Returns:
        (k, 7) interpolated [t, quat] poses.

    Reference: vectorized_generalized_interpolation, interpolation_utils.py:102-128.
    """
    control_poses = control_poses.astype(jnp.float32)
    control_ts = control_ts.astype(jnp.float32)
    interp_ts = interp_ts.astype(jnp.float32)

    indices = jnp.searchsorted(control_ts, interp_ts, side="right")
    indices = jnp.clip(indices, 1, len(control_ts) - 1) - 1

    start = control_poses[indices]
    end = control_poses[indices + 1]
    start_ts = control_ts[indices]
    end_ts = control_ts[indices + 1]
    t = ((interp_ts - start_ts) / (end_ts - start_ts))[..., None]

    trans = (1 - t) * start[:, :3] + t * end[:, :3]
    rot = slerp(start[:, 3:], end[:, 3:], t)
    return jnp.concatenate([trans, rot], axis=1)


def interpolate_c2w(
    ctrl_tangents: jnp.ndarray, ctrl_ts: jnp.ndarray, query_ts: jnp.ndarray
) -> jnp.ndarray:
    """Tangent-space control points -> interpolated (k, 3, 4) camera matrices.

    The full differentiable chain used by the spline camera optimizer
    (ns_camera_optimizer.py:130-147): clip times to the knot range, convert
    learnable (m, 6) tangents to quaternion maps, lerp+slerp, back to matrices.
    """
    ts = jnp.clip(query_ts.reshape(-1), ctrl_ts[0], ctrl_ts[-1])
    ctrl_quats = lie.exp_map_to_quat_map(ctrl_tangents)
    interp = interpolate_pose_map(ctrl_quats, ctrl_ts, ts)
    return lie.quat_map_to_mtx(interp)


def find_closest_idxs(ref: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest element of sorted `ref` for each element of `query`.

    Reference: data_components.py:5-29 (used to snap event-ray timestamps to the
    nearest RGB camera index so appearance embeddings line up across sensors).
    """
    insert = jnp.searchsorted(ref, query)
    insert = jnp.clip(insert, max=len(ref) - 1)
    d_here = jnp.abs(ref[insert] - query)
    prev = jnp.clip(insert - 1, min=0)
    d_prev = jnp.abs(ref[prev] - query)
    return jnp.where(d_prev < d_here, prev, insert)


def find_closest_idxs_exclusive(ref: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Like find_closest_idxs but never returns an exact-match element.

    Reference: data_components.py:32-67.
    """
    insert = jnp.searchsorted(ref, query)
    insert = jnp.clip(insert, max=len(ref) - 1)
    d_here = jnp.abs(ref[insert] - query)
    prev = jnp.clip(insert - 1, min=0)
    d_prev = jnp.abs(ref[prev] - query)
    nxt = jnp.clip(insert + 1, max=len(ref) - 1)
    d_next = jnp.abs(ref[nxt] - query)

    same = ref[insert] == query
    d_here = jnp.where(same, jnp.inf, d_here)

    mask_prev = (d_prev <= d_here) & (d_prev <= d_next)
    mask_next = (d_next < d_here) & (d_next < d_prev)
    out = jnp.where(mask_prev, prev, insert)
    return jnp.where(mask_next, nxt, out)
