"""Checkpoint save/load with the reference's resume contract.

Capability parity with lse_trainer.py:85-122 + SURVEY.md section 5:
  - periodic saves named step-{step:09d} under <run>/checkpoints
  - --load-dir style latest-step autodetection by filename parse (:91-94)
  - resume restores weights + step (optimizer/scaler restore is intentionally
    skipped for load-dir resumes, :105-106 — we mirror that default but also
    support full restore)
  - eval-mode load strips every camera_optimizer entry (+ its optimizer state)
    so refined poses never leak into eval (:68-82)

Backed by orbax (StandardCheckpointer) over the numpy-ified pytree.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _flatten_opt_state(opt_state) -> dict:
    """optax states are nests of registered namedtuples; orbax's Standard
    handler restores them as plain dicts/lists, so persist the LEAVES keyed
    by position and rebuild with the live treedef on restore (the structure
    is always reconstructable from the fresh `tx.init`)."""
    leaves = jax.tree.flatten(opt_state)[0]
    return {f"{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}


def save_checkpoint(ckpt_dir: str, step: int, params: dict, occ_state,
                    opt_state=None, rng=None):
    """Periodic save. With opt_state/rng this is an EXACT resume point
    (reference saves optimizers + scaler, lse_trainer.py:94-98)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = osp.abspath(osp.join(ckpt_dir, f"step-{step:09d}"))
    payload = {
        "step": step,
        "params": _to_numpy(params),
        "occ": {
            "occs": np.asarray(occ_state.occs),
            "binaries": np.asarray(occ_state.binaries),
        },
    }
    if opt_state is not None:
        payload["opt_leaves"] = _flatten_opt_state(opt_state)
    if rng is not None:
        payload["rng"] = np.asarray(rng)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Latest-step autodetect by name parse (reference lse_trainer.py:91-94)."""
    if not osp.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"step-(\d+)$", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def strip_camera_opt(params: dict) -> dict:
    """Eval-mode transform: drop learned cameras (lse_trainer.py:68-82)."""
    out = dict(params)
    if "camera_opt" in out:
        out["camera_opt"] = jax.tree.map(lambda x: np.zeros_like(x), out["camera_opt"])
    return out


def load_checkpoint(
    ckpt_dir: str,
    step: Optional[int] = None,
    strip_cameras: bool = False,
):
    """Returns (step, params, occ dict). step=None -> latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        assert step is not None, f"no checkpoints found in {ckpt_dir}"
    path = osp.abspath(osp.join(ckpt_dir, f"step-{step:09d}"))
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    params = payload["params"]
    if strip_cameras:
        params = strip_camera_opt(params)
    return int(payload["step"]), params, payload["occ"]


def load_checkpoint_full(ckpt_dir: str, step: Optional[int] = None):
    """Exact-resume load: (step, params, occ, opt_leaves|None, rng|None).
    Mirrors the reference's --load-checkpoint path, which restores the
    optimizers and grad scaler (lse_trainer.py:108-120), unlike --load-dir
    which restores weights only."""
    if step is None:
        step = latest_step(ckpt_dir)
        assert step is not None, f"no checkpoints found in {ckpt_dir}"
    path = osp.abspath(osp.join(ckpt_dir, f"step-{step:09d}"))
    payload = ocp.StandardCheckpointer().restore(path)
    return (
        int(payload["step"]),
        payload["params"],
        payload["occ"],
        payload.get("opt_leaves"),
        payload.get("rng"),
    )


def restore_into_state(state, payload_params: dict, occ: dict, step: int,
                       strict: bool = False, opt_leaves: dict = None,
                       rng=None):
    """Graft loaded arrays into a freshly-initialized TrainState (non-strict:
    missing/new keys keep their init values, mirroring load_state_dict
    strict=False at lse_pipeline.py:236-247).

    opt_leaves/rng (from load_checkpoint_full) make the resume EXACT: Adam
    moments, schedule counts, and the occupancy-sampling RNG continue where
    the save left off. A leaf-count/shape mismatch (changed model config)
    keeps the fresh optimizer state instead."""
    import jax.numpy as jnp

    def merge(init_tree, loaded_tree):
        if isinstance(init_tree, dict):
            out = {}
            for k, v in init_tree.items():
                if isinstance(loaded_tree, dict) and k in loaded_tree:
                    out[k] = merge(v, loaded_tree[k])
                else:
                    if strict:
                        raise KeyError(f"missing checkpoint key {k}")
                    out[k] = v
            return out
        if loaded_tree is None:
            return init_tree
        loaded = jnp.asarray(loaded_tree)
        if loaded.shape != init_tree.shape:
            if strict:
                raise ValueError(
                    f"shape mismatch {loaded.shape} vs {init_tree.shape}"
                )
            return init_tree
        return loaded

    new_params = merge(state.params, payload_params)
    new_occ = state.occ.replace(
        occs=jnp.asarray(occ["occs"]), binaries=jnp.asarray(occ["binaries"])
    )
    new_opt = state.opt_state
    if opt_leaves is not None:
        init_leaves, treedef = jax.tree.flatten(state.opt_state)
        loaded = [opt_leaves[k] for k in sorted(opt_leaves)]
        compatible = len(loaded) == len(init_leaves) and all(
            np.shape(a) == np.shape(b) for a, b in zip(loaded, init_leaves)
        )
        if compatible:
            new_opt = jax.tree.unflatten(
                treedef,
                [
                    jnp.asarray(a, dtype=getattr(b, "dtype", None))
                    for a, b in zip(loaded, init_leaves)
                ],
            )
        elif strict:
            raise ValueError(
                "checkpoint optimizer state is incompatible with the "
                f"current config ({len(loaded)} vs {len(init_leaves)} leaves)"
            )
    new_rng = state.rng if rng is None else jnp.asarray(rng)
    return state.replace(
        params=new_params, occ=new_occ, step=jnp.int32(step + 1),
        opt_state=new_opt, rng=new_rng,
    )
