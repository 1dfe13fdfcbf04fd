"""Intensity mappers: linear radiance -> per-sensor response curves.

Capability parity with reference intensity_mappers.py: MLP_Mapper (1->1, 4x16,
sigmoid out, identity-pretrained), RGB_MLP_Mapper (3->3), GT_Mapper (x^(1/2.4)
gamma), IdentityMapper, Powpow (learnable-exponent gamma). Mappers are functional:
`init_mapper(name, key)` returns a (possibly empty) param dict; `apply_mapper`
evaluates. The MAPPERS registry mirrors MAPPERS_DICT (intensity_mappers.py:90-94).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from lsenerf_tpu.models import mlp


def _identity_pretrain(params: dict, in_dim: int, n_steps: int = 5000) -> dict:
    """Fit the mapper MLP to the identity on [0,1] before joint training.

    Reference intensity_mappers.py:8-25: 5000 Adam(5e-2) steps against a
    100-point linspace. Done as a jitted lax.scan (milliseconds for a 16-wide
    MLP on any backend).
    """
    lins = jnp.linspace(0, 1, 100)[..., None]
    inp = jnp.concatenate([lins] * in_dim, axis=-1)
    tx = optax.adam(5e-2)

    def loss_fn(p):
        out = mlp.apply_mlp(p, inp, out_activation=jax.nn.sigmoid)
        return jnp.mean((out - inp) ** 2)

    def step(carry, _):
        p, opt_state = carry
        grads = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return (optax.apply_updates(p, updates), opt_state), None

    (params, _), _ = jax.lax.scan(step, (params, tx.init(params)), None, length=n_steps)
    return params


def init_mapper(name: str, key: jax.Array) -> dict:
    name = name.lower()
    if name == "mlp":
        p = mlp.init_mlp(key, in_dim=1, num_layers=4, layer_width=16, out_dim=1)
        return {"mlp": _identity_pretrain(p, 1)}
    if name == "rgb_mlp":
        p = mlp.init_mlp(key, in_dim=3, num_layers=4, layer_width=16, out_dim=3)
        return {"mlp": _identity_pretrain(p, 3)}
    if name == "powpow":
        return {"pow_coeff": jnp.ones((1,), dtype=jnp.float32)}
    if name in ("gt", "identity"):
        return {}
    raise ValueError(f"unknown mapper '{name}'")


def apply_mapper(name: str, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    name = name.lower()
    if name in ("mlp", "rgb_mlp"):
        return mlp.apply_mlp(params["mlp"], x, out_activation=jax.nn.sigmoid)
    if name == "powpow":
        return x ** params["pow_coeff"]
    if name == "gt":
        return x ** (1.0 / 2.4)
    if name == "identity":
        return x
    raise ValueError(f"unknown mapper '{name}'")


MAPPERS = ("mlp", "rgb_mlp", "gt", "identity", "powpow")
