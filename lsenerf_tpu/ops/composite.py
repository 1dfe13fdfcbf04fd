"""Volume-rendering compositing over dense masked samples.

The TPU-native replacement for nerfacc's `render_weight_from_density`,
`render_visibility_from_density` and `accumulate_along_rays` (reference
lsenerf.py:300-318, lse_grid_estimator.py:109-138): with the dense
(n_rays, k) layout these all collapse into masked cumulative ops along the
sample axis — exactly what XLA fuses well.

Semantics mirrored from the reference pipeline:
  - alpha-threshold culling before compositing (samples whose alpha is below
    the threshold are treated as empty, lse_grid_estimator.py:109-127; the
    caller passes min(alpha_thre, occs.mean()) — models/lsenerf.render_bundle
    threads the live grid mean in as a traced scalar, so early training with
    a sparse-mean grid culls exactly like nerfacc)
  - early termination once transmittance drops below early_stop_eps (:115)
  - RGB/accumulation/depth renderers (lsenerf.py:197-199); depth is the
    "expected" variant, weights-normalized; LinearRenderer == no background
    blend / no clamp (lse_renderer.py:4-10)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsenerf_tpu.cameras.rays import RaySamples


def render_weights(
    samples: RaySamples,
    densities: jnp.ndarray,
    alpha_thre=0.0,
    early_stop_eps: float = 1e-4,
) -> jnp.ndarray:
    """(n, k, 1) densities -> (n, k) compositing weights.

    weights_i = alpha_i * prod_{j<i} (1 - alpha_j), with culled samples
    contributing neither opacity nor transmittance loss.

    alpha_thre may be a Python float (static) or a traced scalar — the
    dynamic `min(alpha_thre, occs.mean())` rule (nerfacc semantics,
    lse_grid_estimator.py:113) passes the current grid mean in as a tracer;
    the culling branch is compiled whenever the value is not a static 0.
    """
    # inf-safe masking: trunc_exp densities can overflow to inf once a
    # surface hardens (exp forward is unclamped, nerfstudio semantics);
    # `densities * mask` would turn masked-out inf into 0*inf = NaN
    mask = samples.mask != 0
    sigma = jnp.where(mask, densities[..., 0], 0.0)
    delta = jnp.where(mask, samples.t_ends - samples.t_starts, 0.0)
    sdt = sigma * delta
    alpha = 1.0 - jnp.exp(-sdt)

    static_off = isinstance(alpha_thre, (int, float)) and alpha_thre <= 0.0
    if not static_off:
        cull = alpha <= alpha_thre
        sdt = jnp.where(cull, 0.0, sdt)
        alpha = jnp.where(cull, 0.0, alpha)

    # exclusive cumulative optical depth -> transmittance BEFORE each sample.
    # Shifted cumsum, NOT cumsum(sdt) - sdt: the subtraction forms inf - inf
    # = NaN at the overflowed sample itself, while nerfacc's iterative
    # T *= (1 - alpha) stays finite (alpha saturates at 1, T at 0) — the
    # shift reproduces that robustness (golden-run NaN at occupancy
    # convergence, ~step 1500).
    accum = jnp.cumsum(sdt, axis=-1)
    excl = jnp.concatenate(
        [jnp.zeros_like(accum[..., :1]), accum[..., :-1]], axis=-1
    )
    trans = jnp.exp(-excl)

    if early_stop_eps > 0.0:
        alpha = jnp.where(trans > early_stop_eps, alpha, 0.0)

    return alpha * trans


def accumulate(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """(n, k) weights x (n, k, c) per-sample values -> (n, c)."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def render_rgb(
    weights: jnp.ndarray,
    rgbs: jnp.ndarray,
    background: str = "linear",
    accumulation: jnp.ndarray | None = None,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Weighted RGB with optional background blending.

    background:
      "linear"       raw weighted sum, no blend (LinearRenderer / training)
      "black"/"white" blend a constant
      "random"       blend per-ray random colors (NGP eval default)
      "last_sample"  blend the final sample's color
    """
    comp = accumulate(weights, rgbs)
    if background == "linear":
        return comp
    if accumulation is None:
        accumulation = jnp.sum(weights, axis=-1, keepdims=True)
    if background == "black":
        bg = jnp.zeros_like(comp)
    elif background == "white":
        bg = jnp.ones_like(comp)
    elif background == "last_sample":
        bg = rgbs[:, -1, :]
    elif background == "random":
        assert rng is not None, "random background needs an rng key"
        bg = jax.random.uniform(rng, comp.shape)
    else:
        raise ValueError(f"unknown background {background}")
    return comp + bg * (1.0 - accumulation)


def render_depth(
    weights: jnp.ndarray, samples: RaySamples, eps: float = 1e-10
) -> jnp.ndarray:
    """Expected depth: sum(w * t_mid) / (sum(w) + eps) (DepthRenderer
    method="expected" semantics)."""
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.sum(weights * t_mid, axis=-1, keepdims=True) / (acc + eps)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-1, keepdims=True)
