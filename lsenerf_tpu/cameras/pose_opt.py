"""Camera-pose optimizers: per-camera SO3xR3/SE3 deltas, continuous-time spline,
and prev/next pairs.

Capability parity with reference ns_camera_optimizer.py:
  - CameraOptimizer (:214-366): (num_cameras, 6) tangent deltas, exp-mapped and
    applied to ray origins/directions
  - SplineCameraOptimizer (:55-211): learnable control tangents along the
    camera trajectory + learnable scale on the RGB->event baseline dM;
    get_rgb / get_evs / get_deblur(4-pose) camera matrices
  - PrevNextCamOptimizer (:368-414): independent delta sets for the EVIMO
    prev/next camera arrays
  - delayed activation scheme (:90-99, :241-256), realized here as a smooth
    static-shape gate: corrections are scaled by an `active` {0,1} flag, which
    both zeroes the delta and kills its gradient (exp(0*p) == identity,
    d/dp == 0), instead of the reference's Python-level mode mutation.

Params are plain dicts so optax.multi_transform can mask them as the
"camera_opt" group. Static trajectory data (control times, dM) lives in
frozen dataclasses alongside.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.cameras import cameras as cam_lib
from lsenerf_tpu.cameras.rays import RayBundle
from lsenerf_tpu.ops import interp, lie

# ---------------------------------------------------------------------------
# per-camera tangent-delta optimizer ("ns" optim_type)
# ---------------------------------------------------------------------------


def init_pose_deltas(num_cameras: int) -> dict:
    return {"pose_adjustment": jnp.zeros((num_cameras, 6), dtype=jnp.float32)}


def pose_correction(
    params: dict, indices: jnp.ndarray, active: jnp.ndarray, mode: str = "SO3xR3"
) -> jnp.ndarray:
    """(n,) camera indices -> (n, 3, 4) correction matrices.

    `active` is a scalar {0.,1.} gate (the delayed scheme); inactive means
    identity corrections with zero gradient.
    """
    deltas = params["pose_adjustment"][indices] * active
    if mode == "SE3":
        return lie.exp_map_SE3(deltas)
    return lie.exp_map_SO3xR3(deltas)


def apply_pose_deltas_to_bundle(
    params: dict, bundle: RayBundle, active: jnp.ndarray, mode: str = "SO3xR3"
) -> RayBundle:
    """Apply learned per-camera deltas to a ray bundle
    (reference ns_camera_optimizer.py:322-329)."""
    if mode == "off":
        return bundle
    corr = pose_correction(params, bundle.camera_indices[:, 0], active, mode)
    return cam_lib.apply_correction_to_bundle(bundle, corr)


def activation_gate(step: jnp.ndarray, scheme: str, delay_cnt: int) -> jnp.ndarray:
    """Scalar 0/1 gate for the delayed-activation scheme
    (reference ns_camera_optimizer.py:94-99: on when step > delay_cnt)."""
    if scheme != "delayed":
        return jnp.float32(1.0)
    return (step > delay_cnt).astype(jnp.float32)


# ---------------------------------------------------------------------------
# prev/next pair optimizer ("prevnext" optim_type)
# ---------------------------------------------------------------------------


def init_prevnext_deltas(num_cameras: int) -> dict:
    return {
        "prev": init_pose_deltas(num_cameras),
        "next": init_pose_deltas(num_cameras),
    }


def apply_prevnext_to_bundles(
    params: dict,
    prev_bundle: RayBundle,
    next_bundle: RayBundle,
    active: jnp.ndarray,
    mode: str = "SO3xR3",
):
    """Unlike the reference's call-order-sensitive counter
    (ns_camera_optimizer.py:396-402), we know which bundle is which."""
    if mode == "off":
        return prev_bundle, next_bundle
    return (
        apply_pose_deltas_to_bundle(params["prev"], prev_bundle, active, mode),
        apply_pose_deltas_to_bundle(params["next"], next_bundle, active, mode),
    )


# ---------------------------------------------------------------------------
# continuous-time spline optimizer ("spline" optim_type)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SplineStatic:
    """Non-learnable spline data (knot times, RGB->event extrinsic, exposure)."""

    ctrl_ts: np.ndarray  # (m,) float32 knot times
    dM: Optional[np.ndarray]  # (4, 4) rigid RGB->event extrinsic or None
    exp_t: float = 30000.0  # camera exposure time (reference config :447)
    n_deblur_rays: int = 4  # poses sampled per exposure (reference :82)


def init_spline(
    c2ws: np.ndarray, cam_ts: np.ndarray, control_pnt_factor: int = 1,
    dM: Optional[np.ndarray] = None, exp_t: float = 30000.0,
):
    """Build spline control points from the camera trajectory.

    Host-side init (scipy slerp oracle), mirroring reference
    ns_camera_optimizer.py:101-128: knots at `control_pnt_factor` x the camera
    rate, converted to learnable (m, 6) tangents.

    Returns:
        (params dict, SplineStatic)
    """
    from scipy.interpolate import interp1d
    from scipy.spatial.transform import Rotation, Slerp

    c2ws = np.asarray(c2ws, dtype=np.float64)
    cam_ts = np.asarray(cam_ts, dtype=np.float64).squeeze()

    rot_interp = Slerp(cam_ts, Rotation.from_matrix(c2ws[:, :3, :3]))
    trans_interp = interp1d(cam_ts, c2ws[:, :3, 3], axis=0, kind="linear")

    max_err = np.abs(rot_interp(cam_ts[0]).as_matrix() - c2ws[0][:3, :3]).max()
    assert max_err < 1e-5, f"c2ws are mirror transforms (err {max_err})"

    n_factor = control_pnt_factor
    ctrl_dts = (np.diff(cam_ts) / n_factor).reshape(-1, 1)
    i_s = np.arange(0, n_factor).reshape(1, -1)
    ctrl_ts = np.concatenate(
        [(cam_ts.reshape(-1, 1)[:-1] + ctrl_dts * i_s).reshape(-1), cam_ts[-1:]]
    ).astype(np.float32)

    Rs = rot_interp(ctrl_ts).as_matrix()
    Ts = trans_interp(ctrl_ts)
    ctrl_c2ws = np.concatenate([Rs, Ts[..., None]], axis=-1)
    tangents = np.asarray(lie.matrix_to_tangent_vector(ctrl_c2ws))

    params = {
        "ctrl_tangents": jnp.asarray(tangents, dtype=jnp.float32),
        "scale": jnp.ones((1,), dtype=jnp.float32),
    }
    static = SplineStatic(
        ctrl_ts=ctrl_ts,
        dM=None if dM is None else np.asarray(dM, dtype=np.float32),
        exp_t=float(exp_t),
    )
    return params, static


def spline_rgb_c2w(
    params: dict, static: SplineStatic, times: jnp.ndarray, active: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate RGB camera poses at `times` (reference :130-147)."""
    # gate gradients, not values: inactive spline still supplies poses
    tangents = _gate_params(params["ctrl_tangents"], active)
    return interp.interpolate_c2w(
        tangents, jnp.asarray(static.ctrl_ts), times
    )


def spline_evs_c2w(
    params: dict, static: SplineStatic, times: jnp.ndarray, active: jnp.ndarray
) -> jnp.ndarray:
    """Event camera poses = RGB spline pose @ (dM with learnable baseline scale)
    (reference :150-174)."""
    assert static.dM is not None, "event spline requires the rel_cam extrinsic dM"
    rgb = spline_rgb_c2w(params, static, times, active)
    dM = jnp.asarray(static.dM)
    scale = _gate_params(params["scale"], active)
    dM_scaled = dM.at[:3, 3:4].multiply(scale)
    return lie.mm(rgb, jnp.broadcast_to(dM_scaled, (rgb.shape[0], 4, 4)))


def spline_deblur_c2w(
    params: dict, static: SplineStatic, cam_ts: jnp.ndarray, active: jnp.ndarray
) -> jnp.ndarray:
    """4 poses spread across the exposure window per input time
    (reference :178-197). cam_ts (n, 1) -> (n*4, 3, 4), time-major per camera."""
    st_t = cam_ts - static.exp_t / 2.0
    delta_t = static.exp_t / (static.n_deblur_rays - 1)
    t_steps = delta_t * jnp.arange(static.n_deblur_rays, dtype=cam_ts.dtype)
    all_ts = (st_t + t_steps[None]).reshape(-1)
    return spline_rgb_c2w(params, static, all_ts, active)


def _gate_params(p: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """active==1 -> p with grads; active==0 -> stop_gradient(p).

    The inactive spline must still produce the *initialized* trajectory
    (unlike the zero-delta optimizers), so we gate the gradient path only.
    """
    import jax

    return active * p + (1.0 - active) * jax.lax.stop_gradient(p)
