"""Per-appearance latent codes bridging exposure/appearance changes.

Capability parity with reference lse_embeddings.py: `EvsFrameEmbedding`
(one row per appearance id, "evs_emb") and `GlobalEmbedding` (a single shared
row, "global_emb"), with eval modes zero / mean / param and the test-embedding
bootstrap used by the emb_eval workflow (init from train row 21,
lse_embeddings.py:63-68).

Functional API: params dict {"table": (rows, dim)} (+ "test_table" once
`init_test_params` has run), static EmbeddingConfig, and an explicit
train/eval switch instead of the reference's gbconfig globals.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lsenerf_tpu.ops.fast_gather import take_rows

EMBEDDING_TYPES = ("global_emb", "evs_emb")
EVAL_MODES = ("zero", "mean", "param")


@dataclass(frozen=True)
class EmbeddingConfig:
    embedding_type: str = "global_emb"  # reference default lse_embeddings.py:96
    emb_dim: int = 32
    eval_mode: str = "zero"
    test_init_row: int = 21  # reference lse_embeddings.py:67
    # eval-run switch: under IS_EVAL the reference routes EVERY forward —
    # including camera-opt/pretrain TRAINING steps — through the eval-mode
    # embedding (lse_embeddings.py:36-38), so "param" pretrain actually
    # trains the test row
    is_eval: bool = False


def init_embedding(key: jax.Array, config: EmbeddingConfig, num_imgs: int) -> dict:
    rows = 1 if config.embedding_type == "global_emb" else num_imgs
    # torch nn.Embedding init: N(0, 1)
    return {"table": jax.random.normal(key, (rows, config.emb_dim), jnp.float32)}


def init_test_params(params: dict, config: EmbeddingConfig) -> dict:
    """Seed a single-row test embedding from a train row (emb_eval stage 1).

    No-op for global embeddings (reference lse_embeddings.py:63-66 skips when
    the table has <= 1 row).
    """
    table = params["table"]
    if table.shape[0] <= 1 or "test_table" in params:
        return params
    row = min(config.test_init_row, table.shape[0] - 1)
    return dict(params, test_table=table[row : row + 1])


def apply_embedding(
    params: dict,
    config: EmbeddingConfig,
    appearance_id: jnp.ndarray,
    train: bool = True,
) -> jnp.ndarray:
    """(n,) or (n,1) appearance ids -> (n, emb_dim) codes.

    Train mode indexes the table (global embedding always row 0,
    lse_embeddings.py:80-82). Eval mode applies config.eval_mode:
    zero / mean-of-rows / learned test row (lse_embeddings.py:24-61).
    An eval RUN (config.is_eval) forces the eval-mode path even for
    training-step forwards (lse_embeddings.py:36-38).
    """
    ids = appearance_id.reshape(-1)
    table = params["table"]
    n = ids.shape[0]

    if config.embedding_type == "global_emb":
        # global: one shared row regardless of id or eval mode
        return jnp.broadcast_to(table[0], (n, table.shape[1]))

    if train and not config.is_eval:
        return take_rows(table, ids)

    if config.eval_mode == "zero":
        return jnp.zeros((n, table.shape[1]), dtype=table.dtype)
    if config.eval_mode == "mean":
        return jnp.broadcast_to(table.mean(axis=0), (n, table.shape[1]))
    if config.eval_mode == "param":
        assert "test_table" in params, (
            "eval_mode='param' requires init_test_params (emb_eval pretrain)"
        )
        return jnp.broadcast_to(params["test_table"][0], (n, table.shape[1]))
    raise ValueError(f"unknown eval_mode {config.eval_mode}")
