"""Collective-traffic accounting for the sharded train step.

Compiles the FLAGSHIP train step over a virtual 8-device mesh and reads the
actual collectives out of the optimized HLO: op kind, element type, shape,
bytes. This makes the multi-chip throughput projection checkable — the DP
overhead per step is (all-reduced bytes) x (ring factor 2(N-1)/N) / ICI
all-reduce bandwidth, and the bytes come from the compiler, not a guess.

Run:
    PYTHONPATH=. JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/psum_accounting.py [--scan K]

Output: one table per program (occ update + train step), plus the ICI-time
model at v5e link speeds. Results recorded in PERFORMANCE.md (round 4).
"""

import argparse
import os
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

COLLECTIVE_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\("
)
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def collect(hlo_text: str) -> dict:
    """{op_kind: [(dtype, shape, bytes), ...]} from optimized HLO."""
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = COLLECTIVE_RE.search(line)
        if not m or "=" not in line:
            continue
        kind = m.group(1)
        # HLO text: `%name = f32[...]{...} all-reduce(...)` — the RESULT
        # shape sits between "=" and the op name; operand shapes (inside the
        # parens) must not be counted. The regex needs the trailing "(" so it
        # matches the op invocation, not the `%all-reduce.N` result name.
        eq = line.index("=")
        result_seg = line[eq + 1 : m.start()]
        for dt, dims in SHAPE_RE.findall(result_seg):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            out.setdefault(kind, []).append((dt, dims, n * DTYPE_BYTES[dt]))
    return out


def report(name: str, hlo_text: str, scan_k: int = 1) -> int:
    cols = collect(hlo_text)
    total = 0
    print(f"\n== {name} ==")
    if not cols:
        print("  (no collectives)")
        return 0
    for kind, items in sorted(cols.items()):
        kind_bytes = sum(b for _, _, b in items)
        total += kind_bytes
        print(f"  {kind}: {len(items)} ops, {kind_bytes/1e6:.2f} MB")
        # largest 5
        for dt, dims, b in sorted(items, key=lambda t: -t[2])[:5]:
            print(f"    {dt}[{dims}]  {b/1e6:.3f} MB")
    # NOTE: counts are STATIC (HLO text): ops inside a lax.scan body print
    # once but execute once PER STEP — so a scan-K chunk whose totals match
    # the single-step program confirms the collectives live in the body and
    # the single-step total IS the per-step traffic.
    print(f"  TOTAL {total/1e6:.2f} MB"
          f"{' (static count; xK if inside the scan body)' if scan_k > 1 else ''}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=16)
    args = ap.parse_args()

    os.environ.setdefault("_LSENERF_DRYRUN_CHILD", "1")
    # Accounting only makes sense on a multi-device mesh; force the virtual
    # 8-CPU mesh regardless of env (this box's sitecustomize overrides
    # JAX_PLATFORMS to the axon TPU backend, so env vars alone don't stick —
    # jax.config wins over both, same pattern as tests/conftest.py).
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship
    from lsenerf_tpu.parallel import mesh as mesh_lib

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    trainer, state = _flagship(tiny=False)
    mesh = mesh_lib.make_mesh(n_dev)
    mesh_lib.round_rays_to_mesh(trainer.dm.config, mesh)
    state = mesh_lib.replicate(state, mesh)

    n_params = sum(
        x.size for x in jax.tree.leaves(state.params)
    )
    print(f"param count: {n_params/1e6:.2f}M "
          f"(f32 grads = {n_params*4/1e6:.1f} MB/step to all-reduce)")

    # single step
    batch = mesh_lib.shard_batch(trainer.dm.next_train(0), mesh)
    step = trainer.make_train_step()
    hlo = step.lower(state, batch).compile().as_text()
    step_bytes = report("train step (sharded, single)", hlo)

    # scan-K chunk (the production dispatch shape)
    stack = mesh_lib.shard_batch_stacked(
        trainer.dm.next_train_stack(0, args.scan), mesh
    )
    multi = trainer.make_train_step_multi(args.scan)
    hlo_k = multi.lower(state, stack).compile().as_text()
    chunk_bytes = report(f"train chunk (scan-{args.scan})", hlo_k, args.scan)

    # occupancy update (sharded sweep + grid re-replication)
    occ_update = trainer.make_occ_update(mesh=mesh)
    hlo_occ = occ_update.lower(state).compile().as_text()
    occ_bytes = report("occ update (sharded sweep)", hlo_occ)

    # ICI-time model: ring all-reduce moves 2(N-1)/N x bytes per chip.
    # v5e: 4 ICI links/chip x ~45 GB/s usable each way ~= 1.8e11 B/s
    # aggregate per chip for an all-reduce on a 1-D ring (scaling-book
    # numbers; treat as +-2x).
    ici_bw = 1.8e11
    n = 8
    per_step = step_bytes  # the scan body repeats this traffic every step
    ar_time_ms = 2 * (n - 1) / n * per_step / ici_bw * 1e3
    print(f"\nICI model (v5e-8, ring): {per_step/1e6:.1f} MB/step ->"
          f" ~{ar_time_ms:.2f} ms/step of collective traffic"
          f" (vs ~29 ms measured single-chip step at proposal-16)")
    occ_amort = occ_bytes / 16 / 1e6
    print(f"occ update collective: {occ_bytes/1e6:.2f} MB per update"
          f" ({occ_amort:.2f} MB/step amortized at interval 16)")


if __name__ == "__main__":
    main()
