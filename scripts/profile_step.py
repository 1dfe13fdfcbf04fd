"""Cost breakdown of the flagship train step on the local accelerator.

Times each stage of the step in isolation at flagship shapes and prints a
table (markdown) for PERFORMANCE.md plus one JSON line. Optionally writes a
jax.profiler trace when --trace DIR is given.

Stage timings use utils.timing.device_time (fori_loop of perturbed-input
iterations per dispatch + host-fetch completion): the tunneled dev chip
DEDUPES value-identical dispatches and does not block on small outputs, so
naive fixed-input timeit loops read ~0 ms (see timing.py docstring).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--iters", type=int, default=6, help="loop iters/dispatch")
    ap.add_argument("--reps", type=int, default=8, help="full_step reps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lsenerf_tpu.utils.timing import device_time
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

    def stage(name, fn, sargs, perturb):
        dt = device_time(fn, sargs, perturb, iters=args.iters, calls=3)
        print(f"[stage] {name}: {dt*1e3:.1f} ms", flush=True)
        rows[name] = dt
        return dt

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

    def perturb_bundle(a, salt):
        b = a[0]
        return (
            b.replace(
                origins=b.origins + salt.astype(jnp.float32) * 1e-7
            ),
        ) + tuple(a[1:])

    stage(
        "march",
        lambda b: march_lib.march_rays(
            b, state.occ, mcfg.grid, mcfg.march_config()
        ).positions,
        (bundle,),
        perturb_bundle,
    )

    # --- hash encode at flagship sample count
    from lsenerf_tpu.ops import hash_encoding as he

    hcfg = fcfg.hash
    table = state.params["model"]["field"]["hash_table"]
    pos = jnp.asarray(rng.random((n_samples, 3), np.float32))

    def perturb_pos(a, salt):
        # jitter positions by an index-dependent epsilon: changes every
        # gather key distribution negligibly but breaks the dispatch cache
        return (a[0], (a[1] + salt.astype(jnp.float32) * 1e-6) % 1.0) + tuple(
            a[2:]
        )

    stage(
        "hash_fwd", lambda t, p: he.hash_encode(t, p, hcfg),
        (table, pos), perturb_pos,
    )
    stage(
        "hash_fwdbwd",
        jax.grad(lambda t, p: he.hash_encode(t, p, hcfg).sum(), argnums=(0, 1)),
        (table, pos), perturb_pos,
    )

    # --- full field fwd / fwd+bwd
    fparams = state.params["model"]["field"]
    dirs = jnp.asarray(rng.random((n_samples, 3), np.float32) - 0.5)
    app = jnp.zeros((n_samples,), jnp.int32)

    def perturb_pos2(a, salt):
        return (a[0], (a[1] + salt.astype(jnp.float32) * 1e-6) % 1.0) + tuple(
            a[2:]
        )

    stage(
        "field_fwd",
        lambda fp, p, d: field_lib.field_apply(fp, p, d, app, fcfg, train=True)[0],
        (fparams, pos, dirs), perturb_pos2,
    )
    stage(
        "field_fwdbwd",
        jax.grad(
            lambda fp, p, d: field_lib.field_apply(
                fp, p, d, app, fcfg, train=True
            )[0].sum(),
            argnums=(0, 1),  # params AND positions, as in training
        ),
        (fparams, pos, dirs), perturb_pos2,
    )

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

    stage("march_flat_cand_occ", cand_occ, (bundle,), perturb_bundle)

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

        def perturb_keys(a, salt):
            return ((a[0] + salt) % jnp.int32(T),) + tuple(a[1:])

        stage(
            "bwd_accumulate",
            lambda k_, g_: fg.sorted_window_accumulate(k_, g_, T, window=128),
            (keys, upd), perturb_keys,
        )
        stage(
            "bwd_sort_only",
            lambda k_: jax.lax.sort(
                [k_, jnp.arange(m, dtype=jnp.int32)], num_keys=1
            )[0],
            (keys,), perturb_keys,
        )
        order = jnp.asarray(rng.permutation(m).astype(np.int32))
        stage(
            "bwd_permute_only",
            lambda g_, o_: jnp.take(g_, o_, axis=0),
            (upd, order),
            lambda a, salt: (a[0], (a[1] + salt) % jnp.int32(m)),
        )

    # --- occupancy update (perturb the state rng; checksum covers occs)
    occ_update = trainer._occ_update

    def perturb_state(a, salt):
        s = a[0]
        return (s.replace(rng=jax.random.fold_in(s.rng, salt)),) + tuple(a[1:])

    stage(
        "occ_update", lambda s: occ_update(s).occ.occs, (state,), perturb_state
    )

    # --- full step: the chained-donated-state protocol is honest (verified
    # by scripts/probe_bench_honesty.py: block-on-scalar vs host fetch agree)
    step = trainer.make_train_step()
    batch = {k_: jnp.asarray(v) for k_, v in dm.next_train(0).items()}

    def run_full(reps):
        st = state
        st, mm = step(st, batch)  # compile + warm
        _ = np.asarray(mm["loss"])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, mm = step(st, batch)
            _ = np.asarray(mm["loss"])
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
