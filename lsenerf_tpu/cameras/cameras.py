"""Camera model and differentiable ray generation.

Behavior parity with the reference's forked nerfstudio Cameras
(lse_cameras.py `EdCameras`):
  - NO half-pixel offset on image coordinates (lse_cameras.py:69-73)
  - single shared intrinsic per camera array (lse_cameras.py:359-362)
  - perspective direction math (x-cx)/fx, -(y-cy)/fy, -1 (:383, :488-493)
  - iterative radial/tangential undistortion (nerfstudio
    camera_utils.radial_and_tangential_undistort semantics)
  - pixel_area from +1-pixel offset ray directions (:556-562)
  - pluggable c2w source so a continuous-time spline interpolator can replace
    the per-index camera matrix (lse_cameras.py:50-64)

Everything here is jit-safe and differentiable w.r.t. the c2w matrices, which
is how pose gradients reach the camera optimizers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from lsenerf_tpu.cameras.rays import RayBundle
from lsenerf_tpu.ops.lie import mm


@struct.dataclass
class Cameras:
    """A batch of pinhole cameras sharing one intrinsic."""

    camera_to_worlds: jnp.ndarray  # (n, 3, 4) OpenGL convention c2w
    fx: float = struct.field(pytree_node=False)
    fy: float = struct.field(pytree_node=False)
    cx: float = struct.field(pytree_node=False)
    cy: float = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    distortion_params: Optional[jnp.ndarray] = None  # (6,) k1 k2 k3 k4 p1 p2
    times: Optional[jnp.ndarray] = None  # (n,)

    def __len__(self) -> int:
        return self.camera_to_worlds.shape[0]


def _distortion_residual_and_jacobian(x, y, xd, yd, p):
    """OpenCV distortion residual + analytic Jacobian (nerfstudio
    camera_utils._compute_residual_and_jacobian semantics)."""
    k1, k2, k3, k4, p1, p2 = p[0], p[1], p[2], p[3], p[4], p[5]
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(
    coords: jnp.ndarray, distortion_params: jnp.ndarray, eps: float = 1e-3, num_iters: int = 10
) -> jnp.ndarray:
    """Newton-iterate the inverse distortion (static num_iters, jit-safe).

    Args:
        coords: (..., 2) distorted normalized image coords.
        distortion_params: (6,) [k1, k2, k3, k4, p1, p2].
    """
    xd, yd = coords[..., 0], coords[..., 1]

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _distortion_residual_and_jacobian(
            x, y, xd, yd, distortion_params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        step_x = jnp.where(jnp.abs(denom) > eps, x_num / denom, jnp.zeros_like(denom))
        step_y = jnp.where(jnp.abs(denom) > eps, y_num / denom, jnp.zeros_like(denom))
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, num_iters, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def generate_rays(
    cams: Cameras,
    camera_indices: jnp.ndarray,
    pixel_coords: jnp.ndarray,
    c2w: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """Generate world-space rays for (camera, pixel) pairs.

    Args:
        cams: camera batch (single intrinsic).
        camera_indices: (n,) int indices into the camera array.
        pixel_coords: (n, 2) [row y, col x] integer pixel coordinates.
        c2w: optional (n, 3, 4) override for the per-ray camera pose (the
            spline/deblur path passes interpolated matrices here; gradients
            flow through it).
    Returns:
        RayBundle with unit directions, pixel_area, metadata.directions_norm.
    """
    if c2w is None:
        c2w = cams.camera_to_worlds[camera_indices]

    y = pixel_coords[..., 0].astype(jnp.float32)
    x = pixel_coords[..., 1].astype(jnp.float32)

    # normalized image-plane coords, no half-pixel offset (lse_cameras.py:69-73)
    coord = jnp.stack([(x - cams.cx) / cams.fx, -(y - cams.cy) / cams.fy], -1)
    coord_x_off = jnp.stack([(x - cams.cx + 1) / cams.fx, -(y - cams.cy) / cams.fy], -1)
    coord_y_off = jnp.stack([(x - cams.cx) / cams.fx, -(y - cams.cy + 1) / cams.fy], -1)
    coord_stack = jnp.stack([coord, coord_x_off, coord_y_off], axis=0)  # (3, n, 2)

    if cams.distortion_params is not None:
        coord_stack = radial_and_tangential_undistort(
            coord_stack, cams.distortion_params
        )

    dirs_cam = jnp.concatenate(
        [coord_stack, -jnp.ones_like(coord_stack[..., :1])], axis=-1
    )  # (3, n, 3)

    rotation = c2w[..., :3, :3]  # (n, 3, 3)
    dirs_world = jnp.einsum(
        "knj,nij->kni", dirs_cam, rotation, precision=jax.lax.Precision.HIGHEST
    )
    norms = jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    dirs_world = dirs_world / norms

    directions = dirs_world[0]
    dx = jnp.sqrt(jnp.sum((directions - dirs_world[1]) ** 2, axis=-1))
    dy = jnp.sqrt(jnp.sum((directions - dirs_world[2]) ** 2, axis=-1))
    pixel_area = (dx * dy)[..., None]

    origins = c2w[..., :3, 3]
    times = None
    if cams.times is not None:
        times = cams.times[camera_indices][..., None]

    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=camera_indices[..., None].astype(jnp.int32),
        times=times,
        metadata={"directions_norm": jax.lax.stop_gradient(norms[0])},
    )


def apply_correction_to_bundle(bundle: RayBundle, correction: jnp.ndarray) -> RayBundle:
    """Apply per-ray (n, 3, 4) pose-correction matrices to a bundle.

    origins += correction translation; directions left-multiplied by the
    correction rotation (reference ns_camera_optimizer.py:322-329).
    """
    origins = bundle.origins + correction[:, :3, 3]
    directions = mm(correction[:, :3, :3], bundle.directions[..., None])[..., 0]
    return bundle.replace(origins=origins, directions=directions)
