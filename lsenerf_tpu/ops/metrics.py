"""Eval image metrics: PSNR and SSIM in pure jnp (+ optional LPIPS hook).

Parity targets: torchmetrics PeakSignalNoiseRatio(data_range=1.0) and
structural_similarity_index_measure as used at reference lsenerf.py:205-207,
511-516. SSIM uses the standard gaussian 11x11 / sigma 1.5 window with
data_range=1.0 (the torchmetrics default estimates data_range from the batch;
for [0,1] images the fixed constant is the conventional choice and matches to
within measurement noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(gt: jnp.ndarray, pred: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the full image."""
    mse = jnp.mean((gt - pred) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM between two (h, w, c) images in [0, data_range]."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)
    # (h, w, c) -> (c, 1, h, w) for feature-map conv; each channel filtered alone
    x = jnp.moveaxis(gt.astype(jnp.float32), -1, 0)[:, None]
    y = jnp.moveaxis(pred.astype(jnp.float32), -1, 0)[:, None]
    k = kernel[None, None]

    def filt(img):
        # HIGHEST: TPU convs default to bf16 MXU passes; the E[x^2]-mu^2
        # variance difference then cancels at ~4e-3 absolute error (vs
        # c2=9e-4) and per-view SSIM blew up to 5.2 on-chip while the same
        # image pair scored 0.73 on CPU. f32-accurate passes fix the moments.
        return jax.lax.conv_general_dilated(
            img, k, window_strides=(1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y

    # Second moments on globally mean-shifted images (variance/covariance are
    # shift-invariant, so this only reduces the magnitudes entering the
    # cancellation-prone E[x^2]-mu^2 difference). The clamps below enforce
    # what exact arithmetic guarantees (sigma >= 0, |cov| <= sqrt(var_x
    # var_y), hence |SSIM| <= 1) as defense in depth against low-precision
    # conv paths; on well-conditioned inputs they are no-ops within float
    # noise. Unclamped LinearRenderer eval preds (reference lsenerf.py:511-516
    # feeds torchmetrics out-of-[0,1] values) make this worse, not better.
    xc = x - jnp.mean(x)
    yc = y - jnp.mean(y)
    mu_xc, mu_yc = filt(xc), filt(yc)
    sigma_x = jnp.maximum(filt(xc * xc) - mu_xc * mu_xc, 0.0)
    sigma_y = jnp.maximum(filt(yc * yc) - mu_yc * mu_yc, 0.0)
    sigma_xy = filt(xc * yc) - mu_xc * mu_yc
    cap = jnp.sqrt(sigma_x * sigma_y)
    sigma_xy = jnp.clip(sigma_xy, -cap, cap)

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def discover_lpips_weights() -> str | None:
    """Locate an exported LPIPS weights .npz (scripts/export_lpips.py).

    Search order: $LSENERF_LPIPS_WEIGHTS, then <repo>/assets/lpips_alex.npz.
    Returns None when nothing is found (eval then reports lpips = NaN).
    """
    import os
    import os.path as osp

    env = os.environ.get("LSENERF_LPIPS_WEIGHTS")
    if env and osp.exists(env):
        return env
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    cand = osp.join(root, "assets", "lpips_alex.npz")
    return cand if osp.exists(cand) else None


class LPIPSMetric:
    """Optional learned perceptual metric.

    The reference uses torchmetrics' LPIPS (a pretrained AlexNet/VGG,
    lsenerf.py:207). This environment has no network access to fetch pretrained
    weights, so LPIPS is exposed as a pluggable hook: if a weights file is
    provided (numpy .npz exported by scripts/export_lpips.py) or discovered via
    discover_lpips_weights(), a JAX forward pass is used; otherwise the metric
    reports NaN and eval continues.
    """

    def __init__(self, weights_path: str | None = None):
        self.available = False
        self.params = None
        if weights_path is None:
            weights_path = discover_lpips_weights()
        if weights_path is not None:
            try:
                self.params = dict(np.load(weights_path))
                self.available = True
            except (OSError, ValueError):
                self.available = False

    def __call__(self, gt: jnp.ndarray, pred: jnp.ndarray) -> float:
        if not self.available:
            return float("nan")
        return float(_lpips_forward(self.params, gt, pred))


def _lpips_forward(params: dict, gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """AlexNet-style LPIPS distance given a flat dict of conv/lin weights.

    Expects keys conv{i}_w (o,i,kh,kw), lin{i}_w (1,c,1,1) and scaling
    shift/scale (1,3,1,1). Inputs are (h,w,3) in [0,1]; normalized to [-1,1].
    """
    def prep(img):
        x = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None] * 2.0 - 1.0
        return (x - params["shift"]) / params["scale"]

    def features(x):
        # LPIPS taps each stage's relu output BEFORE the maxpool that feeds
        # the next conv (lpips pretrained_networks.alexnet slices: conv-relu |
        # pool-conv-relu | pool-conv-relu | conv-relu | conv-relu).
        feats = []
        i = 0
        strides = params.get("strides", np.array([4, 2, 1, 1, 1]))
        pads = params.get("pads", np.array([2, 2, 1, 1, 1]))
        while f"conv{i}_w" in params:
            if i in (1, 2):
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
            w = params[f"conv{i}_w"]
            p = int(pads[i]) if i < len(pads) else 1
            s = int(strides[i]) if i < len(strides) else 1
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(s, s), padding=[(p, p), (p, p)]
            )
            if f"conv{i}_b" in params:
                x = x + params[f"conv{i}_b"].reshape(1, -1, 1, 1)
            x = jax.nn.relu(x)
            feats.append(x)
            i += 1
        return feats

    f_gt, f_pred = features(prep(gt)), features(prep(pred))
    total = 0.0
    for i, (a, b) in enumerate(zip(f_gt, f_pred)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        w = params[f"lin{i}_w"]
        total = total + jnp.mean(jnp.sum(diff * w, axis=1))
    return total
