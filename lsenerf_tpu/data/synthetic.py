"""Analytic synthetic scene: colored sphere + orbiting cameras + event frames.

Test/benchmark scene generator (no disk data needed): a Lambertian-ish sphere
whose surface color is a function of the normal, viewed by cameras on a circle
looking at the origin. Event frames are exact delta-log-gray between
consecutive camera images, so the event loss has a consistent optimum. This
backs BASELINE config #1 (CPU-runnable RGB-only) and the event-path tests.
"""

from __future__ import annotations

import numpy as np

from lsenerf_tpu.cameras.cameras import Cameras
from lsenerf_tpu.data.dataset import ColorDataset, EventFrameDataset

EPS = 1e-6
REC601 = np.array([0.2989, 0.5870, 0.1140], np.float32)


def look_at_c2w(eye: np.ndarray, target: np.ndarray, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """OpenGL-convention camera-to-world (camera looks down -z)."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    up = np.asarray(up, np.float64)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward  # -z is the view direction
    c2w[:3, 3] = eye
    return c2w[:3, :4].astype(np.float32)


def orbit_cameras(
    n: int, radius: float = 1.5, height: float = 0.4,
    h: int = 64, w: int = 64, focal: float = 80.0,
    t_span: float = 1e6, arc: float = 1.5 * np.pi,
) -> Cameras:
    import jax.numpy as jnp

    angles = np.linspace(0.0, arc, n, endpoint=False)
    c2ws = np.stack(
        [
            look_at_c2w(
                np.array([radius * np.cos(a), height, radius * np.sin(a)]),
                np.zeros(3),
            )
            for a in angles
        ]
    )
    times = np.linspace(0.0, t_span, n).astype(np.float32)
    return Cameras(
        camera_to_worlds=jnp.asarray(c2ws),
        fx=focal, fy=focal, cx=w / 2.0, cy=h / 2.0, width=w, height=h,
        times=jnp.asarray(times),
    )


def render_sphere_image(
    cam_c2w: np.ndarray, cams: Cameras, sphere_r: float = 0.5,
    texture_freq: float = 0.0,
):
    """Analytic render of the normal-colored sphere (white background).

    texture_freq > 0 multiplies the albedo by a smooth high-frequency
    world-fixed pattern sin(f*phi)*sin(f*theta) on the surface. A smooth
    sphere under small per-frame camera motion (real-scale golden: 1.35
    deg/frame) produces delta-log-gray ~1e-3 — event supervision at noise
    level, which lets the powpow mapper exponent collapse toward 0 and
    destabilizes x**(c-1) gradients at the 1e-5 clamp floor. The texture
    restores realistic event magnitudes (|delta log| ~0.1-0.5, like real
    event-camera recordings at e_thresh 0.2)."""
    h, w = cams.height, cams.width
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs_cam = np.stack(
        [
            (xs - cams.cx) / cams.fx,
            -(ys - cams.cy) / cams.fy,
            -np.ones_like(xs, np.float64),
        ],
        axis=-1,
    )
    R, o = cam_c2w[:3, :3], cam_c2w[:3, 3]
    d = dirs_cam @ R.T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    # ray-sphere: |o + t d|^2 = r^2
    b = 2 * d @ o
    c = o @ o - sphere_r**2
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
    hit &= t > 0

    t_safe = np.where(np.isfinite(t), t, 0.0)
    p = o[None, None] + t_safe[..., None] * d
    normal = p / sphere_r
    color = 0.5 + 0.45 * normal  # normal-coded surface color
    if texture_freq > 0.0:
        phi = np.arctan2(p[..., 2], p[..., 0])
        theta = np.arccos(np.clip(p[..., 1] / sphere_r, -1.0, 1.0))
        tex = 0.5 + 0.5 * np.sin(texture_freq * phi) * np.sin(texture_freq * theta)
        color = color * (0.35 + 0.65 * tex)[..., None]
    img = np.ones((h, w, 3), np.float32)
    img[hit] = color[hit].astype(np.float32)
    return img


def make_synthetic_scene(
    n_cams: int = 12, h: int = 48, w: int = 48, focal: float = 60.0,
    e_thresh: float = 0.2, texture_freq: float = 0.0,
):
    """Returns (ColorDataset, EventFrameDataset).

    Event frame i captures delta-log-gray between camera i and i+1 (consecutive
    pairing, reference lse_ray_generator.py:46-68), stored as counts so that
    counts * e_thresh == exact delta log intensity.
    """
    cams = orbit_cameras(n_cams, h=h, w=w, focal=focal)
    c2ws = np.asarray(cams.camera_to_worlds)
    images = np.stack([
        render_sphere_image(c2ws[i], cams, texture_freq=texture_freq)
        for i in range(n_cams)
    ])

    gray = images @ REC601
    log_gray = np.log(gray + EPS)
    eimgs = (log_gray[1:] - log_gray[:-1])[..., None] / e_thresh

    col = ColorDataset(
        images=images, cameras=cams, appearance_ids=np.arange(n_cams, dtype=np.int32)
    )
    import jax.numpy as jnp
    from dataclasses import replace as _replace  # noqa: F401

    evs_cams = Cameras(
        camera_to_worlds=cams.camera_to_worlds,
        fx=cams.fx, fy=cams.fy, cx=cams.cx, cy=cams.cy,
        width=cams.width, height=cams.height,
        times=cams.times,
    )
    evs = EventFrameDataset(
        eimgs=eimgs.astype(np.float32),
        cameras=evs_cams,
        e_thresh=e_thresh,
        appearance_ids=np.arange(n_cams - 1, dtype=np.int32),
    )
    return col, evs


def gl_c2w_to_cv_json(c2w: np.ndarray) -> tuple:
    """GL cam-to-world (3x4) -> (CV w2c orientation rows, camera position).

    Exact inverse of parser.cv_to_working: GL c2w columns are
    (right, -up_cv, -forward_cv), position is the camera center.
    """
    cols = c2w[:3, :3]
    orientation = np.stack([cols[:, 0], -cols[:, 1], -cols[:, 2]])
    return orientation, c2w[:3, 3]


def write_reference_scene(
    root: str,
    n_cams: int = 12,
    h: int = 64,
    w: int = 64,
    focal: float = 60.0,
    e_thresh: float = 0.2,
    n_val: int = 2,
    with_prevnext: bool = False,
    with_msk: bool = False,
    with_full_camera: bool = False,
    texture_freq: float = 0.0,
):
    """Write the synthetic sphere scene in the reference on-disk layout.

    Produces exactly the LSENeRF-formatter tree the parser consumes
    (reference lse_parser.py: colcam_set/{camera,rgb/1x,dataset,metadata},
    ecam_set/{camera,eimgs,dataset,scene,metadata}) so the parity harness
    exercises the real parse -> train -> eval path end to end. Deterministic:
    regenerating the scene produces byte-identical files.

    Real-scale golden profile (VERDICT r2 #5): n_cams>=200, h/w=480/640
    (VGA), with_prevnext (explicit prev_camera/next_camera event pairing),
    with_msk, with_full_camera (dense trajectory for spline knots).
    """
    import json
    import os
    import os.path as osp

    from PIL import Image

    col_ds, evs_ds = make_synthetic_scene(
        n_cams=n_cams, h=h, w=w, focal=focal, e_thresh=e_thresh,
        texture_freq=texture_freq,
    )
    c2ws = np.asarray(col_ds.cameras.camera_to_worlds)
    times = np.asarray(col_ds.cameras.times)

    def cam_json(c2w, t):
        ori, pos = gl_c2w_to_cv_json(c2w)
        return {
            "orientation": ori.tolist(),
            "position": pos.tolist(),
            "focal_length": focal,
            "principal_point": [w / 2.0, h / 2.0],
            "image_size": [w, h],
            "radial_distortion": [0.0, 0.0, 0.0],
            "tangential_distortion": [0.0, 0.0],
            "t": float(t),
        }

    def write_cam_dir(cam_dir, mats=None, ts=None):
        os.makedirs(cam_dir, exist_ok=True)
        mats = c2ws if mats is None else mats
        ts = times if ts is None else ts
        for i in range(len(mats)):
            with open(osp.join(cam_dir, f"{i:06d}.json"), "w") as f:
                json.dump(cam_json(mats[i], ts[i]), f, indent=1)

    col = osp.join(root, "colcam_set")
    evs = osp.join(root, "ecam_set")
    write_cam_dir(osp.join(col, "camera"))
    write_cam_dir(osp.join(evs, "camera"))
    if with_prevnext:
        # event frame i spans [t_i, t_{i+1}]: prev pose == camera i, next
        # pose == camera i+1 (reference prev_camera/next_camera dirs,
        # lse_parser.py:295-309)
        write_cam_dir(osp.join(evs, "prev_camera"), c2ws[:-1], times[:-1])
        write_cam_dir(osp.join(evs, "next_camera"), c2ws[1:], times[1:])
    if with_full_camera:
        # dense trajectory for full-trajectory spline knots
        # (lse_parser.py:455-463): 2x interpolated orbit poses
        dense = orbit_cameras(2 * n_cams, h=h, w=w, focal=focal)
        write_cam_dir(
            osp.join(col, "full_camera"),
            np.asarray(dense.camera_to_worlds),
            np.asarray(dense.times),
        )
    if with_msk:
        np.save(osp.join(col, "msk.npy"), np.ones((h, w), np.float32))
        np.save(osp.join(evs, "msk.npy"), np.ones((h, w), np.float32))

    os.makedirs(osp.join(col, "rgb", "1x"), exist_ok=True)
    for i in range(n_cams):
        img8 = np.clip(col_ds.images[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(img8).save(osp.join(col, "rgb", "1x", f"{i:06d}.png"))

    meta = {str(i): {"appearance_id": i} for i in range(n_cams)}
    for d in (col, evs):
        with open(osp.join(d, "metadata.json"), "w") as f:
            json.dump(meta, f)

    # the parser drops ids >= n_imgs - 1, so usable ids are [0, n_cams-2]
    usable = list(range(n_cams - 1))
    val_ids = usable[-n_val:]
    train_ids = usable[: -n_val] if n_val else usable
    with open(osp.join(col, "dataset.json"), "w") as f:
        json.dump({"train_ids": train_ids, "val_ids": val_ids}, f)
    with open(osp.join(evs, "dataset.json"), "w") as f:
        json.dump({"train_ids": list(range(n_cams - 1))}, f)
    os.makedirs(osp.join(evs, "eimgs"), exist_ok=True)
    # Quantize delta-log-intensity to integer event counts. At high frame
    # density (real-scale golden: 200 frames/orbit) the per-frame delta is
    # far below a fixed contrast threshold and rint() would zero every
    # event, silently removing event supervision from the scene. Adapt the
    # written threshold so typical moving-pixel deltas land at ~2 counts,
    # capped at the requested e_thresh (small scenes keep 0.2 exactly).
    raw_delta = np.asarray(evs_ds.eimgs)[..., 0] * e_thresh
    e_eff = e_thresh
    counts = np.rint(raw_delta / e_eff)
    if (counts != 0).mean() < 0.01:  # fixed threshold is vacuous here
        moving = np.abs(raw_delta[np.abs(raw_delta) > 1e-6])
        if moving.size:
            e_eff = float(max(np.quantile(moving, 0.9) / 2.0, 1e-6))
            counts = np.rint(raw_delta / e_eff)
    counts = counts.astype(np.int16)
    with open(osp.join(evs, "scene.json"), "w") as f:
        json.dump({"e_thresh": e_eff}, f)
    np.save(osp.join(evs, "eimgs", "eimgs_1x.npy"), counts)
    return root
