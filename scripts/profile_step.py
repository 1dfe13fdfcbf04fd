"""Cost breakdown of the flagship train step on the local accelerator.

Times each stage of the step in isolation at flagship shapes and prints a
table (markdown) for PERFORMANCE.md plus one JSON line. Optionally writes a
jax.profiler trace when --trace DIR is given.

Stages:
  - march            ray marching (3512 rays merged col/prev/next)
  - hash_fwd         hash encode forward only (168k samples)
  - hash_fwdbwd      hash encode forward + table/position gradients
  - field_fwd        full field (hash + MLPs + SH) forward
  - field_fwdbwd     full field forward + backward
  - occ_update       one occupancy-grid refresh
  - full_step        the real jitted train step (loss + grads + Adam)

The residual (full_step - field_fwdbwd - march - amortized occ) is
composite/losses/optimizer overhead.
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, *args, reps=8, name=None):
    """Median per-call time (robust to intermittent tunnel stalls)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    if name:
        print(f"[stage] {name}: {dt*1e3:.1f} ms "
              f"(min {min(ts)*1e3:.1f}, max {max(ts)*1e3:.1f})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lsenerf_tpu.utils.tpu_retry import warmup

    warmup()

    from __graft_entry__ import _flagship
    from lsenerf_tpu.cameras import cameras as cam_lib
    from lsenerf_tpu.models import field as field_lib
    from lsenerf_tpu.ops import march as march_lib

    trainer, state = _flagship(tiny=False)
    mcfg = trainer.model_config
    fcfg = mcfg.field
    dm = trainer.dm

    n_rays = dm.config.train_num_rays_per_batch
    k = mcfg.max_samples
    n_samples = n_rays * k

    rng = np.random.default_rng(0)
    rows = {}

    # --- march at flagship ray count
    cams = dm.col.cameras
    idx = jnp.asarray(rng.integers(0, len(cams), n_rays), jnp.int32)
    coords = jnp.asarray(
        np.stack(
            [rng.integers(0, cams.height, n_rays),
             rng.integers(0, cams.width, n_rays)], 1
        ).astype(np.float32)
    )
    bundle = cam_lib.generate_rays(cams, idx, coords)

    march_fn = jax.jit(
        lambda b: march_lib.march_rays(
            b, state.occ, mcfg.grid, mcfg.march_config()
        ).positions
    )
    rows["march"] = timeit(march_fn, bundle, reps=args.reps, name="march")

    # --- hash encode at flagship sample count
    from lsenerf_tpu.ops import hash_encoding as he

    hcfg = fcfg.hash
    table = state.params["model"]["field"]["hash_table"]
    pos = jnp.asarray(rng.random((n_samples, 3), np.float32))

    hash_fwd = jax.jit(lambda t, p: he.hash_encode(t, p, hcfg))
    rows["hash_fwd"] = timeit(hash_fwd, table, pos, reps=args.reps, name="hash_fwd")

    hash_fwdbwd = jax.jit(
        jax.grad(lambda t, p: he.hash_encode(t, p, hcfg).sum(), argnums=(0, 1))
    )
    rows["hash_fwdbwd"] = timeit(hash_fwdbwd, table, pos, reps=args.reps, name="hash_fwdbwd")

    # --- full field fwd / fwd+bwd
    fparams = state.params["model"]["field"]
    dirs = jnp.asarray(rng.random((n_samples, 3), np.float32) - 0.5)
    app = jnp.zeros((n_samples,), jnp.int32)

    field_fwd = jax.jit(
        lambda fp, p, d: field_lib.field_apply(fp, p, d, app, fcfg, train=True)[0]
    )
    rows["field_fwd"] = timeit(field_fwd, fparams, pos, dirs, reps=args.reps, name="field_fwd")

    field_fwdbwd = jax.jit(
        jax.grad(
            lambda fp, p, d: field_lib.field_apply(
                fp, p, d, app, fcfg, train=True
            )[0].sum()
        )
    )
    rows["field_fwdbwd"] = timeit(field_fwdbwd, fparams, pos, dirs, reps=args.reps, name="field_fwdbwd")

    # --- micro stages: march internals
    from lsenerf_tpu.ops import occupancy as occ_lib

    mconf = mcfg.march_config()

    def cand_occ(b):
        o = jax.lax.stop_gradient(b.origins)
        d = jax.lax.stop_gradient(b.directions)
        outer_half = mcfg.grid.aabb_scale * (2.0 ** (mcfg.grid.levels - 1))
        t_enter, t_exit = march_lib.ray_aabb_intersect(o, d, outer_half)
        t_lo = jnp.maximum(jnp.maximum(t_enter, mconf.near_plane), 0.0)
        ts = march_lib.candidate_ts(t_lo, mconf)
        mids = 0.5 * (ts[:, :-1] + ts[:, 1:])
        occ = occ_lib.occupancy_at_coords(
            state.occ,
            o[:, None, 0] + mids * d[:, None, 0],
            o[:, None, 1] + mids * d[:, None, 1],
            o[:, None, 2] + mids * d[:, None, 2],
            mcfg.grid,
        )
        return occ

    rows["march_cand_occ"] = timeit(
        jax.jit(cand_occ), bundle, reps=args.reps, name="march_cand_occ"
    )

    # --- micro stages: hash backward split (blocked layout path)
    if hcfg.layout == "blocked":
        from lsenerf_tpu.ops import fast_gather as fg

        L = hcfg.num_levels
        m = n_samples * L
        T = int(hcfg.blocked_level_rows().sum())
        W = hcfg.blocked_row_width
        gdt = jnp.bfloat16 if hcfg.gather_dtype == "bfloat16" else jnp.float32
        keys = jnp.asarray(rng.integers(0, T, m), jnp.int32)
        upd = jnp.asarray(rng.random((m, W), np.float32), gdt)

        sort_fn = jax.jit(
            lambda k_, g_: fg.sorted_window_accumulate(k_, g_, T, window=128)
        )
        rows["bwd_accumulate"] = timeit(
            sort_fn, keys, upd, reps=args.reps, name="bwd_accumulate"
        )

        sort_only = jax.jit(
            lambda k_: jax.lax.sort(
                [k_, jnp.arange(m, dtype=jnp.int32)], num_keys=1
            )[0]
        )
        rows["bwd_sort_only"] = timeit(
            sort_only, keys, reps=args.reps, name="bwd_sort_only"
        )

        perm_only = jax.jit(lambda g_, o_: jnp.take(g_, o_, axis=0))
        order = jnp.asarray(rng.permutation(m).astype(np.int32))
        rows["bwd_permute_only"] = timeit(
            perm_only, upd, order, reps=args.reps, name="bwd_permute_only"
        )

    # --- occupancy update
    occ_update = trainer._occ_update
    rows["occ_update"] = timeit(
        occ_update, state, reps=max(2, args.reps // 2), name="occ_update"
    )

    # --- full step; the step donates its input state, so chain it through
    # the calls instead of reusing a donated buffer
    step = trainer.make_train_step()
    batch = {k_: jnp.asarray(v) for k_, v in dm.next_train(0).items()}

    def run_full(reps):
        st = state
        st, m = step(st, batch)  # compile + warm
        jax.block_until_ready(m["loss"])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, m = step(st, batch)
            jax.block_until_ready(m["loss"])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"[stage] full_step: {dt*1e3:.1f} ms "
              f"(min {min(ts)*1e3:.1f}, max {max(ts)*1e3:.1f})", flush=True)
        return dt

    if args.trace:
        with jax.profiler.trace(args.trace):
            rows["full_step"] = run_full(args.reps)
        print(f"trace written to {args.trace}")
    else:
        rows["full_step"] = run_full(args.reps)

    occ_amort = rows["occ_update"] / 16.0  # refreshed every 16 steps
    explained = rows["march"] + rows["field_fwdbwd"] + occ_amort
    rows["other (composite/losses/adam)"] = max(
        0.0, rows["full_step"] - explained
    )

    print("\n| stage | ms | % of step |")
    print("|---|---|---|")
    for name, dt in rows.items():
        pct = 100.0 * dt / rows["full_step"]
        print(f"| {name} | {dt*1e3:.1f} | {pct:.0f}% |")
    print()
    print(json.dumps({k_: round(v * 1e3, 2) for k_, v in rows.items()}))


if __name__ == "__main__":
    main()
