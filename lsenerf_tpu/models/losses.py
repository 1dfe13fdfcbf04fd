"""Training losses: RGB MSE (plain / deblur) and event log-intensity losses.

Behavior parity with reference lsenerf.py:392-439 (log_loss, enerf_norm_loss,
mse_loss, get_loss_dict) and the rgb-to-1-channel reducers ThreeToOne / ToGrayGT
(lsenerf.py:102-119). Pure jnp functions over fixed-shape batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsenerf_tpu import EPS
from lsenerf_tpu.ops.image import to_gray


def mse_loss(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((gt - pred) ** 2)


def log_loss(evs: jnp.ndarray, prev_rad: jnp.ndarray, next_rad: jnp.ndarray) -> jnp.ndarray:
    """Event supervision: MSE between rendered delta-log radiance and the
    e_thresh-scaled event frame (reference lsenerf.py:392-399).

    `evs` must already be scaled by e_thresh (the dataset does that,
    lse_dataset.py:86-88) and broadcast to the radiance channel count
    (lsenerf.py:434-436).
    """
    if prev_rad.shape[-1] != 1:
        prev_rad, next_rad = to_gray(prev_rad), to_gray(next_rad)
    delta_log = jnp.log(next_rad + EPS) - jnp.log(prev_rad + EPS)
    return mse_loss(delta_log, evs)


def enerf_norm_loss(
    evs: jnp.ndarray,
    prev_rad: jnp.ndarray,
    next_rad: jnp.ndarray,
    e_thresh: jnp.ndarray,
) -> jnp.ndarray:
    """E-NeRF-style normalized event loss (reference lsenerf.py:406-419)."""
    if prev_rad.shape[-1] != 1:
        prev_rad, next_rad = to_gray(prev_rad), to_gray(next_rad)
    delta_log = jnp.log(next_rad + EPS) - jnp.log(prev_rad + EPS)
    log_norm = jnp.linalg.norm(delta_log, axis=0, keepdims=True) + EPS
    evs_unscaled = jax.lax.stop_gradient(evs / e_thresh)
    evs_norm = jax.lax.stop_gradient(
        jnp.linalg.norm(evs_unscaled, axis=0, keepdims=True) + EPS
    )
    return mse_loss(delta_log / log_norm, evs_unscaled / evs_norm)


def init_rgb_to_one(kind: str) -> dict:
    """Params for the RGB->1ch reducer used before the event loss.

    kind "learned": softmax-weighted channel mix initialised uniform
    (ThreeToOne, lsenerf.py:102-109). kind "gt": fixed Rec.601 (ToGrayGT,
    lsenerf.py:112-119) -> no params.
    """
    if kind == "learned":
        return {"weights": jnp.ones((1, 3), dtype=jnp.float32) / 3.0}
    return {}


def apply_rgb_to_one(kind, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "learned":
        w = jax.nn.softmax(params["weights"], axis=-1)
        return x @ w.T
    if kind == "gt":
        return to_gray(x)
    return x  # kind False/None: keep 3 channels


EVENT_LOSSES = ("log_loss", "enerf_norm_loss")
