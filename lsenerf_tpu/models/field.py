"""The LSE NeRF field: hash-grid density branch + SH-direction color branch
with appearance embeddings.

Capability parity with reference lse_field.py `LSEField`:
  - density: contract(positions) -> [0,1]^3 -> hash encode -> MLP(2x64) ->
    1 + 15 features, trunc_exp density, out-of-box selector zeroing
    (lse_field.py:264-288)
  - color: SH(4)(dirs) + geo features + appearance embedding -> MLP(3x64) ->
    sigmoid RGB (lse_field.py:290-359)
  - unbounded-scene L-inf contraction to [-2,2] then (x+2)/4
    (SceneContraction(order=inf), lsenerf.py:163-166 + lse_field.py:266-269)
  - train/eval appearance-embedding switch (lse_field.py:305-310)

Functional: `init_field` -> params pytree; `field_density` / `field_apply` are
pure and jit/vmap/grad-safe. bfloat16 is used inside the MLPs (MXU-friendly)
with float32 accumulation at the activations that matter.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import jax
import jax.numpy as jnp
import numpy as np

from lsenerf_tpu.models import embeddings as emb_lib
from lsenerf_tpu.models import mlp
from lsenerf_tpu.ops import hash_encoding as he
from lsenerf_tpu.ops import sh


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped-gradient backward (nerfstudio trunc_exp semantics):
    stabilizes high dynamic-range densities."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@dataclass(frozen=True)
class FieldConfig:
    aabb_scale: float = 1.0  # scene box [-s, s]^3 (lse_parser.py:246-249)
    use_contraction: bool = True  # SceneContraction(order=inf) unless disabled
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    average_init_density: float = 1.0
    sh_levels: int = 4
    hash: he.HashEncodingConfig = dc_field(default_factory=he.HashEncodingConfig)
    embedding: emb_lib.EmbeddingConfig = dc_field(
        default_factory=emb_lib.EmbeddingConfig
    )
    compute_dtype: str = "float32"  # "bfloat16" runs MLPs on the MXU fast path
    # Strided coarse-level sampling (VERDICT r3 lever 1b): hash-encode the
    # lowest `coarse_levels` levels at every `coarse_stride`-th sample along
    # each ray (plus the last sample) and lerp the features in t between
    # anchors; fine levels keep the full sample rate. Coarse grids (res
    # 16-42 at flagship) vary over >=4 samples (distinct-key fraction 0.23
    # at level 0, scripts/measure_dedup.py), so anchor features bracket the
    # in-between samples. coarse_stride=1 is EXACTLY the plain path
    # (tests/test_field.py); >1 trades coarse-level gather rows for a lerp.
    coarse_stride: int = 1
    coarse_levels: int = 4

    def __post_init__(self):
        if self.coarse_stride > 1:
            # coarse_levels=0 would collide with the level_hi=0 "all levels"
            # sentinel (both encodes covering the full ladder -> doubled
            # feature width); coarse_levels>=num_levels leaves the fine
            # encode with zero levels (ADVICE r4).
            if not 0 < self.coarse_levels < self.hash.num_levels:
                raise ValueError(
                    f"coarse_stride={self.coarse_stride} requires "
                    f"0 < coarse_levels < num_levels "
                    f"(got coarse_levels={self.coarse_levels}, "
                    f"num_levels={self.hash.num_levels})"
                )


def init_field(key: jax.Array, config: FieldConfig, num_imgs: int = 1) -> dict:
    k_hash, k_base, k_color, k_emb = jax.random.split(key, 4)
    # the embedding config's emb_dim is authoritative when embeddings are on
    # (reference lse_field.py:167-171: "num_dims is overide by EdEmbeddingConfig")
    app_dim = config.embedding.emb_dim if config.appearance_embedding_dim > 0 else 0
    params = {
        "hash_table": he.init_hash_table(k_hash, config.hash),
        "base_mlp": mlp.init_mlp(
            k_base,
            in_dim=config.hash.out_dim,
            num_layers=config.num_layers,
            layer_width=config.hidden_dim,
            out_dim=1 + config.geo_feat_dim,
        ),
        "color_mlp": mlp.init_mlp(
            k_color,
            in_dim=config.sh_levels**2 + config.geo_feat_dim + app_dim,
            num_layers=config.num_layers_color,
            layer_width=config.hidden_dim_color,
            out_dim=3,
        ),
    }
    if app_dim > 0:
        params["appearance"] = emb_lib.init_embedding(k_emb, config.embedding, num_imgs)
    return params


def contract_positions(positions: jnp.ndarray, config: FieldConfig) -> tuple:
    """World positions -> unit-cube field inputs + in-bounds selector.

    Contraction path: L-inf contraction of unbounded space into [-2,2], then
    (x+2)/4 (reference lse_field.py:264-274). Non-contraction path: normalize
    by the aabb. Either way the selector zeroes out-of-range inputs before
    they reach the (periodic) hash table.
    """
    if config.use_contraction:
        mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
        contracted = jnp.where(
            mag <= 1.0, positions, (2.0 - 1.0 / mag) * positions / mag
        )
        unit = (contracted + 2.0) / 4.0
    else:
        s = config.aabb_scale
        unit = (positions + s) / (2.0 * s)
    selector = jnp.all((unit > 0.0) & (unit < 1.0), axis=-1)
    return unit * selector[..., None], selector


def field_density(params: dict, positions: jnp.ndarray, config: FieldConfig):
    """(n, 3) world positions -> (density (n, 1), geo_feat (n, geo_feat_dim))."""
    unit, selector = contract_positions(positions, config)
    feats = he.hash_encode(params["hash_table"], unit, config.hash)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    h = mlp.apply_mlp(params["base_mlp"], feats.astype(dtype)).astype(jnp.float32)
    density_before, geo = h[..., :1], h[..., 1:]
    density = config.average_init_density * trunc_exp(density_before)
    return density * selector[..., None], geo


def _strided_encode(params: dict, unit: jnp.ndarray, ts: jnp.ndarray,
                    config: FieldConfig, selector: jnp.ndarray = None):
    """Hash features with coarse levels anchored at every coarse_stride-th
    sample and lerped in t between anchors.

    unit: (n, k, 3) unit-cube positions; ts: (n, k) sample midpoints along
    the ray. Returns (n*k, L*F) features identical in layout to the plain
    encode (coarse levels lead, level-major). Invalid trailing slots sit at
    t=0 (ops/march.py one-hot compaction), so their lerp denominators go
    non-positive and the clip degrades to the left (valid) anchor — masked
    slots never contaminate valid ones.

    selector: optional (n, k) in-bounds mask. contract_positions zeroes
    out-of-bounds unit coords, so an OOB anchor would be hash-encoded at
    the cube corner and its garbage features lerped into neighboring
    in-bounds samples (reachable in aabb mode near the ray/aabb boundary —
    the plain path confines that encode to the OOB sample itself, whose own
    selector zeroes its density). The lerp weight is therefore snapped to
    the VALID anchor when exactly one of the pair is out of bounds. A valid
    sample between two invalid anchors keeps the (corner-encoded) lerp —
    same degradation as before, only reachable when S exceeds the in-bounds
    run length.
    """
    from dataclasses import replace as dc_replace

    n, k, _ = unit.shape
    C, S = config.coarse_levels, config.coarse_stride
    flat = unit.reshape(-1, 3)
    fine_cfg = dc_replace(config.hash, level_lo=C)
    feats_fine = he.hash_encode(params["hash_table"], flat, fine_cfg)

    anchor_idx = np.arange(0, k, S)
    if anchor_idx[-1] != k - 1:
        anchor_idx = np.concatenate([anchor_idx, [k - 1]])
    A = len(anchor_idx)
    coarse_cfg = dc_replace(config.hash, level_hi=C)
    feats_a = he.hash_encode(
        params["hash_table"], unit[:, anchor_idx].reshape(-1, 3), coarse_cfg
    ).reshape(n, A, -1)

    # sample j lies between anchors seg(j) and seg(j)+1 — static index map
    seg = np.minimum(np.arange(k) // S, A - 2)
    t_left = ts[:, anchor_idx[seg]]  # (n, k)
    t_right = ts[:, anchor_idx[seg + 1]]
    denom = t_right - t_left
    w = jnp.where(
        denom > 1e-12, (ts - t_left) / jnp.where(denom > 1e-12, denom, 1.0), 0.0
    )
    w = jnp.clip(w, 0.0, 1.0)
    if selector is not None:
        sel_a = selector.reshape(n, k)[:, anchor_idx]  # (n, A) in-bounds
        sl, sr = sel_a[:, seg], sel_a[:, seg + 1]  # (n, k)
        w = jnp.where(sl & ~sr, 0.0, jnp.where(~sl & sr, 1.0, w))
    w = w[..., None].astype(feats_a.dtype)
    feats_coarse = (1.0 - w) * feats_a[:, seg] + w * feats_a[:, seg + 1]
    return jnp.concatenate(
        [feats_coarse.reshape(n * k, -1), feats_fine], axis=-1
    )


def field_density_strided(
    params: dict, positions: jnp.ndarray, ts: jnp.ndarray, config: FieldConfig
):
    """field_density over (n, k, 3) ray-structured samples with strided
    coarse-level encoding (config.coarse_stride > 1). Returns flat
    (n*k, 1) density and (n*k, geo) features like the plain path."""
    n, k, _ = positions.shape
    unit, selector = contract_positions(positions.reshape(-1, 3), config)
    feats = _strided_encode(
        params, unit.reshape(n, k, 3), ts, config, selector=selector
    )
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    h = mlp.apply_mlp(params["base_mlp"], feats.astype(dtype)).astype(jnp.float32)
    density_before, geo = h[..., :1], h[..., 1:]
    density = config.average_init_density * trunc_exp(density_before)
    return density * selector[..., None], geo


def field_apply_strided(
    params: dict,
    positions: jnp.ndarray,
    ts: jnp.ndarray,
    directions: jnp.ndarray,
    appearance_id: jnp.ndarray,
    config: FieldConfig,
    train: bool = True,
):
    """field_apply over (n, k)-structured samples with strided coarse-level
    encoding. directions/appearance_id arrive flat (n*k, ...) exactly as the
    plain path receives them."""
    density, geo = field_density_strided(params, positions, ts, config)
    d_enc = sh.sh_encode(directions, config.sh_levels)
    pieces = [d_enc, geo]
    if "appearance" in params:
        pieces.append(
            emb_lib.apply_embedding(
                params["appearance"], config.embedding, appearance_id, train=train
            )
        )
    h = jnp.concatenate(pieces, axis=-1)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rgb = mlp.apply_mlp(
        params["color_mlp"], h.astype(dtype), out_activation=jax.nn.sigmoid
    ).astype(jnp.float32)
    return density, rgb


def field_apply(
    params: dict,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    appearance_id: jnp.ndarray,
    config: FieldConfig,
    train: bool = True,
):
    """Full field evaluation -> (density (n,1), rgb (n,3))."""
    density, geo = field_density(params, positions, config)
    d_enc = sh.sh_encode(directions, config.sh_levels)
    pieces = [d_enc, geo]
    if "appearance" in params:
        pieces.append(
            emb_lib.apply_embedding(
                params["appearance"], config.embedding, appearance_id, train=train
            )
        )
    h = jnp.concatenate(pieces, axis=-1)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rgb = mlp.apply_mlp(
        params["color_mlp"], h.astype(dtype), out_activation=jax.nn.sigmoid
    ).astype(jnp.float32)
    return density, rgb


def density_fn(params: dict, positions: jnp.ndarray, config: FieldConfig) -> jnp.ndarray:
    """Density-only closure used by the occupancy-grid update and march culling
    (reference lsenerf.py:192-194 VolumetricSampler density_fn)."""
    return field_density(params, positions, config)[0]
