"""Minimal functional MLP used across the field and the intensity mappers.

Equivalent in capability to nerfstudio's MLP component (used by the reference at
lse_field.py:199-207, :254-262 and intensity_mappers.py:8-25): `num_layers`
Linear layers, ReLU between hidden layers, optional output activation.

Parameters are a plain dict of arrays ({"w0", "b0", "w1", ...}); weights are
stored (in_dim, out_dim) so `apply` is `x @ w + b`, which XLA maps straight onto
the MXU. Init matches torch.nn.Linear (uniform +/- 1/sqrt(fan_in)) so training
dynamics are comparable to the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    in_dim: int,
    num_layers: int,
    layer_width: int,
    out_dim: int,
) -> dict:
    """Create MLP params: num_layers linear layers (num_layers-1 hidden ReLUs)."""
    dims = [in_dim] + [layer_width] * (num_layers - 1) + [out_dim]
    params = {}
    for i in range(num_layers):
        key, wk, bk = jax.random.split(key, 3)
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        params[f"w{i}"] = jax.random.uniform(
            wk, (dims[i], dims[i + 1]), jnp.float32, -bound, bound
        )
        params[f"b{i}"] = jax.random.uniform(
            bk, (dims[i + 1],), jnp.float32, -bound, bound
        )
    return params


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    out_activation: Optional[Callable] = None,
    hidden_activation: Callable = jax.nn.relu,
) -> jnp.ndarray:
    num_layers = len(params) // 2
    for i in range(num_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < num_layers - 1:
            x = hidden_activation(x)
    if out_activation is not None:
        x = out_activation(x)
    return x


def mlp_num_layers(params: dict) -> int:
    return len(params) // 2
