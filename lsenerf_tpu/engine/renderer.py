"""Chunked full-image rendering for eval (reference
get_outputs_for_camera_ray_bundle semantics: chunk by eval_num_rays_per_chunk,
lse_pipeline.py:212, lse_config.py:27)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.cameras import cameras as cam_lib
from lsenerf_tpu.models import lsenerf as model_lib
from lsenerf_tpu.ops import occupancy as occ_lib


def render_image(
    model_params: dict,
    cams: cam_lib.Cameras,
    cam_idx: int,
    occ_state: occ_lib.OccGridState,
    config: model_lib.ModelConfig,
    appearance_id: int = 0,
    chunk: int = 4096,
    c2w_override=None,
    rng: jax.Array | None = None,
) -> dict:
    """Render one full camera view -> dict of (h, w, c) images."""
    h, w = cams.height, cams.width
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=1).astype(np.float32)
    n = coords.shape[0]
    pad = (-n) % chunk
    coords = np.concatenate([coords, np.zeros((pad, 2), np.float32)])

    @jax.jit
    def render_chunk(coords_chunk, key):
        idx = jnp.full((chunk,), cam_idx, jnp.int32)
        c2w = None
        if c2w_override is not None:
            c2w = jnp.broadcast_to(c2w_override, (chunk, 3, 4))
        bundle = cam_lib.generate_rays(cams, idx, coords_chunk, c2w=c2w)
        meta = dict(bundle.metadata)
        meta["appearance_id"] = jnp.full((chunk,), appearance_id, jnp.int32)
        bundle = bundle.replace(metadata=meta)
        out = model_lib.model_forward(
            model_params, bundle, occ_state, config, train=False
        )
        if config.background_color != "linear" and not config.use_mapping:
            # eval-mode background blending (RGBRenderer eval semantics); with
            # mapping the LinearRenderer keeps the raw sum (lse_renderer.py:4-10)
            acc = out["accumulation"]
            if config.background_color == "white":
                out["rgb"] = out["rgb"] + (1.0 - acc)
            elif config.background_color == "random":
                bg = jax.random.uniform(key, out["rgb"].shape)
                out["rgb"] = out["rgb"] + bg * (1.0 - acc)
            out["rgb"] = jnp.clip(out["rgb"], 0.0, 1.0)
        return out

    outs = []
    key = rng if rng is not None else jax.random.PRNGKey(0)
    for i in range(0, len(coords), chunk):
        key, k = jax.random.split(key)
        outs.append(render_chunk(jnp.asarray(coords[i : i + chunk]), k))

    merged = {}
    for name in outs[0]:
        vals = np.concatenate([np.asarray(o[name]) for o in outs])[:n]
        if vals.ndim == 1:
            vals = vals[:, None]
        merged[name] = vals.reshape(h, w, -1)
    return merged
