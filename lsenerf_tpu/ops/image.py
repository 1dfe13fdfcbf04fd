"""Image-space helpers shared by losses, eval, and artifact rendering.

Behavior parity with reference lse_nerf/utils.py (to_gray :99-105,
correct_img_scale :109-135, linear_correction :138-150) and lsenerf.py
(lin_log :123-135, _make_error_map :442-460). Pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsenerf_tpu import EPS

# Rec.601 luma weights (reference utils.py:103)
REC601 = jnp.array([0.2989, 0.5870, 0.1140], dtype=jnp.float32)


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 1) Rec.601 grayscale; pass non-3-channel inputs through."""
    if img.shape[-1] != 3:
        return img
    return img @ REC601.reshape(-1, 1).astype(img.dtype)


def lin_log(x: jnp.ndarray, threshold: float = 20.0) -> jnp.ndarray:
    """Linear below `threshold`, logarithmic above (event-camera response model).

    Input range 0-255. The reference (lsenerf.py:123-135) promotes to float64
    for the computation; we stay in float32 (JAX x64 is disabled for TPU) —
    the max deviation from the f64 result over the full 0-255 grid is < 3e-4
    absolute (~2e-5 relative, XLA's f32 log approximation), measured by
    tests/test_losses_mappers.py::test_lin_log_f32_matches_f64_oracle.
    """
    x = x.astype(jnp.float32)
    f = (1.0 / threshold) * jnp.log(threshold)
    y = jnp.where(x <= threshold, x * f, jnp.log(x))
    return y


def solve_normal_equations(pred_log: jnp.ndarray, gt_log: jnp.ndarray):
    """Least-squares affine fit gt_log ~ a * pred_log + b via normal equations.

    Reference utils.py:109-130 (taken from E-NeRF); the NaN fallbacks clamp to
    +/- 5/255 exactly as the reference does.
    """
    n = pred_log.size
    x = jnp.ones((n, 2), dtype=pred_log.dtype)
    x = x.at[:, 1].set(pred_log.reshape(-1))
    y = gt_log.reshape(-1)
    beta = jnp.linalg.inv(x.T @ x) @ x.T @ y
    a, b = beta[1], beta[0]
    fallback = jnp.asarray(5.0 / 255.0, dtype=pred_log.dtype)
    a = jnp.where(jnp.isnan(a), fallback, a)
    b = jnp.where(jnp.isnan(b), fallback, b)
    return a, b


def correct_img_scale(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Log-domain affine rescale of a prediction onto the GT brightness scale.

    Used for events-only eval where absolute intensity is unobservable
    (reference utils.py:132-135, lse_pipeline.py:149-164).
    """
    gt_log, pred_log = jnp.log(gt + EPS), jnp.log(pred + EPS)
    a, b = solve_normal_equations(pred_log, gt_log)
    return jnp.exp(a * pred_log + b)


def linear_correction(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Per-channel linear lstsq color correction (reference utils.py:138-150)."""
    ori_shape = pred.shape
    gt_f = gt.reshape(-1, 3)
    pred_f = pred.reshape(-1, 3)
    x = jnp.concatenate([pred_f, jnp.ones((len(pred_f), 1), dtype=pred.dtype)], axis=1)
    hi = jax.lax.Precision.HIGHEST
    xtx = jnp.matmul(x.T, x, precision=hi)
    xty = jnp.matmul(x.T, gt_f, precision=hi)
    params = jnp.linalg.solve(xtx, xty)
    return jnp.clip(jnp.matmul(x, params, precision=hi).reshape(ori_shape), 0, 1)


def make_error_map(rgb: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Signed grayscale-error visualization (red = over, blue-ish = under).

    Reference lsenerf.py:442-460: white background; positive error dims G and B,
    negative error dims R and G, scaled by norm_cnst=6.
    """
    norm_cnst = 6.0
    err = (to_gray(rgb)[..., 0] - to_gray(pred)[..., 0]) * norm_cnst
    h, w = rgb.shape[0], rgb.shape[1]
    err_img = jnp.ones((h, w, 3), dtype=rgb.dtype)
    pos = err > 0
    neg = err < 0
    g = jnp.where(pos, 1 - err, jnp.where(neg, 1 - jnp.abs(err), 1.0))
    b = jnp.where(pos, 1 - err, 1.0)
    r = jnp.where(neg, 1 - jnp.abs(err), 1.0)
    return jnp.stack([r, g, b], axis=-1).astype(err_img.dtype)
