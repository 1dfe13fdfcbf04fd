"""Pallas TPU kernels for the blocked hash-encode trilinear combine.

Why: the XLA formulation of the combine (transpose (m,64)->(64,m), build a
(27,1,m) weight tensor, broadcast-multiply-reduce) measures 13.8 ms at
flagship shapes — more than the 11.6 ms table gather it post-processes —
and the backward's position-gradient path mirrors the same cost. The
arithmetic is trivially elementwise over samples: per sample, 27 scalar
weights (products of three 3-slot per-dim weights) contract 27 vertex
feature pairs. A Pallas kernel does it in one pass over the gathered rows
at memory speed, with no transposes and no broadcast materialization
(~0.5 ms of traffic).

Kernel vocabulary: elementwise VPU ops + static lane slices only — the
subset the environment's Mosaic toolchain compiles (scripts/pallas_probe3/4
established that dynamic gathers do NOT beat XLA and are avoided; see
PERFORMANCE.md "Pallas status").

Availability is probed at first use (`available()`): this environment's
remote Mosaic compiler intermittently rejects shapes; callers fall back to
the XLA path when the probe fails.

Encoded factor convention (shared with the factored backward,
ops/hash_encoding.py): per dimension, e = o + w with parity o in {0,1} and
trilinear frac w in [0,1) -> o = floor(e), w = e - o.
"""

from __future__ import annotations

import functools

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 2048
_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _dim_dec(e):
    """Decode e = o + w. Parity clamps to {0,1}: w may equal exactly 1.0
    (boundary-clipped positions), where (o, 1) and (o+1, 0) give identical
    slot weights — clamping picks the valid representative."""
    o = jnp.minimum(jnp.floor(e), 1.0)
    return o, e - o


def _dim_u(e):
    """(b,) encoded factor -> three (b,) slot weights over {0,1,2}."""
    o, w = _dim_dec(e)
    u0 = (1.0 - w) * (1.0 - o)
    u1 = w * (1.0 - o) + (1.0 - w) * o
    u2 = w * o
    return u0, u1, u2


def _combine_kernel(rows_ref, ex_ref, ey_ref, ez_ref, out_ref, *, F):
    rows = rows_ref[...].astype(jnp.float32)  # (B, 27*F[+pad])
    ux = _dim_u(ex_ref[...])
    uy = _dim_u(ey_ref[...])
    uz = _dim_u(ez_ref[...])
    acc = [jnp.zeros(rows.shape[:1], jnp.float32) for _ in range(F)]
    for vx in range(3):
        for vy in range(3):
            wxy = ux[vx] * uy[vy]
            for vz in range(3):
                v = (vx * 3 + vy) * 3 + vz
                w = wxy * uz[vz]
                for f in range(F):
                    acc[f] = acc[f] + w * rows[:, v * F + f]
    for f in range(F):
        out_ref[f : f + 1, :] = acc[f][None, :]


def _bwd_kernel(rows_ref, g_ref, ex_ref, ey_ref, ez_ref, out_ref, *, F):
    """Position-gradient half of the combine VJP.

    out rows 0..2 are d(loss)/d(w_dim) per sample (the caller chains through
    d(w)/d(position) = level scaling); g_ref is the (F, B) output cotangent.
    """
    rows = rows_ref[...].astype(jnp.float32)
    g = g_ref[...]
    ux = _dim_u(ex_ref[...])
    uy = _dim_u(ey_ref[...])
    uz = _dim_u(ez_ref[...])
    ox, _ = _dim_dec(ex_ref[...])
    oy, _ = _dim_dec(ey_ref[...])
    oz, _ = _dim_dec(ez_ref[...])

    B = rows.shape[0]
    dux = [jnp.zeros((B,), jnp.float32) for _ in range(3)]
    duy = [jnp.zeros((B,), jnp.float32) for _ in range(3)]
    duz = [jnp.zeros((B,), jnp.float32) for _ in range(3)]
    for vx in range(3):
        for vy in range(3):
            for vz in range(3):
                v = (vx * 3 + vy) * 3 + vz
                gv = jnp.zeros((B,), jnp.float32)
                for f in range(F):
                    gv = gv + g[f, :] * rows[:, v * F + f]
                dux[vx] = dux[vx] + gv * uy[vy] * uz[vz]
                duy[vy] = duy[vy] + gv * ux[vx] * uz[vz]
                duz[vz] = duz[vz] + gv * ux[vx] * uy[vy]

    def dw_of(du, o):
        # du/dw over slots {o, o+1}: d u0/dw=-(1-o), d u1/dw=(1-2o), d u2/dw=o
        return -du[0] * (1.0 - o) + du[1] * (1.0 - 2.0 * o) + du[2] * o

    out_ref[0:1, :] = dw_of(dux, ox)[None, :]
    out_ref[1:2, :] = dw_of(duy, oy)[None, :]
    out_ref[2:3, :] = dw_of(duz, oz)[None, :]


def _pad_to(x, mult, axis=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _interpret() -> bool:
    """Interpret mode off-TPU so CPU tests exercise the kernel math."""
    import jax.extend.backend as jxb

    try:
        return jxb.get_backend().platform != "tpu"
    except RuntimeError:
        return True


@functools.lru_cache(maxsize=None)
def _combine_call(F, Wrow, dtype_name):
    from jax.experimental import pallas as pl

    def run(rows, ex, ey, ez):
        m = rows.shape[0]
        rows_p = _pad_to(rows, _BLOCK)
        mp = rows_p.shape[0]
        exp, eyp, ezp = (_pad_to(e, _BLOCK) for e in (ex, ey, ez))
        out = pl.pallas_call(
            functools.partial(_combine_kernel, F=F),
            grid=(mp // _BLOCK,),
            in_specs=[
                pl.BlockSpec((_BLOCK, Wrow), lambda g: (g, 0)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
            ],
            out_specs=pl.BlockSpec((F, _BLOCK), lambda g: (0, g)),
            out_shape=jax.ShapeDtypeStruct((F, mp), jnp.float32),
            interpret=_interpret(),
        )(rows_p, exp, eyp, ezp)
        return out[:, :m]

    return run


@functools.lru_cache(maxsize=None)
def _bwd_call(F, Wrow, dtype_name):
    from jax.experimental import pallas as pl

    def run(rows, g, ex, ey, ez):
        m = rows.shape[0]
        rows_p = _pad_to(rows, _BLOCK)
        mp = rows_p.shape[0]
        gp = _pad_to(g, _BLOCK, axis=1)
        exp, eyp, ezp = (_pad_to(e, _BLOCK) for e in (ex, ey, ez))
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, F=F),
            grid=(mp // _BLOCK,),
            in_specs=[
                pl.BlockSpec((_BLOCK, Wrow), lambda g: (g, 0)),
                pl.BlockSpec((F, _BLOCK), lambda g: (0, g)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
                pl.BlockSpec((_BLOCK,), lambda g: (g,)),
            ],
            out_specs=pl.BlockSpec((3, _BLOCK), lambda g: (0, g)),
            out_shape=jax.ShapeDtypeStruct((3, mp), jnp.float32),
            interpret=_interpret(),
        )(rows_p, gp, exp, eyp, ezp)
        return out[:, :m]

    return run


def combine(rows, ex, ey, ez, F):
    """(m, Wrow) gathered rows + per-dim encoded factors -> (F, m) f32."""
    return _combine_call(F, rows.shape[1], str(rows.dtype))(rows, ex, ey, ez)


def combine_bwd_dw(rows, g, ex, ey, ez, F):
    """Backward: (m, Wrow) rows, (F, m) cotangent -> (3, m) d(loss)/d(w_dim)."""
    return _bwd_call(F, rows.shape[1], str(rows.dtype))(rows, g, ex, ey, ez)


_AVAILABLE = None


def available() -> bool:
    """Probe-compile the combine at REAL block shapes on this backend.

    The environment's remote Mosaic compiler accepts/rejects by shape, so
    the probe uses the production block size and a 2-step grid — if this
    compiles, the flagship call (same blocks, larger grid) compiles.
    """
    global _AVAILABLE
    if _AVAILABLE is None:
        if _interpret():
            # off-TPU the kernels only run in (slow) interpret mode — the
            # XLA path is the right default there; tests opt in explicitly
            # with combine_impl="pallas"
            _AVAILABLE = False
            return _AVAILABLE
        # The probe compile runs in a SUBPROCESS with a hard timeout: this
        # environment's remote Mosaic compiler sometimes HANGS (no error,
        # no result) on these kernels — an in-process probe would hang the
        # caller (e.g. the benchmark driver) with it.
        import subprocess
        import sys

        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import numpy as np, jax.numpy as jnp\n"
            "from lsenerf_tpu.ops import pallas_combine as pc\n"
            "m = 2 * pc._BLOCK\n"
            "rows = jnp.zeros((m, 64), jnp.bfloat16)\n"
            "e = jnp.zeros((m,), jnp.float32)\n"
            "np.asarray(pc.combine(rows, e, e, e, 2))\n"
            "np.asarray(pc.combine_bwd_dw(rows, jnp.ones((2, m), "
            "jnp.float32), e, e, e, 2))\n"
        ) % (_REPO_ROOT,)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=240,
                capture_output=True,
            )
            _AVAILABLE = r.returncode == 0
        except Exception:
            _AVAILABLE = False
    return _AVAILABLE
