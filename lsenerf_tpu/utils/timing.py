"""Device micro-benchmark helper robust to the tunneled-chip dispatch cache.

The dev chip sits behind a network tunnel (axon) that (a) adds ~20-27 ms RTT
per dispatch and (b) DEDUPES identical dispatches: re-running the same
executable on the same buffers returns the cached result in <1 ms without
touching the chip (measured in scripts/probe_timing.py — fixed-input reps
read 0.5 ms for a 2.7M-element sort that really costs ~12 ms).

`device_time` defeats both: the op runs `iters` times inside ONE jitted
fori_loop (amortizing RTT to RTT/iters), each iteration perturbing the
designated input so no two executions are value-identical, and each outer
call uses a fresh salt so no two dispatches are input-identical. The op's
outputs are reduced to a scalar checksum carried through the loop, keeping
every iteration data-dependent (XLA cannot elide or reorder them) and the
transferred result tiny.
"""

from __future__ import annotations

import time

import numpy as np


def device_time(fn, args, perturb, iters=8, calls=3, warmup_calls=1):
    """Median per-iteration seconds of `fn(*args)` on the device.

    Args:
        fn: jittable callable; its output pytree is checksum-reduced.
        args: tuple of concrete device arrays.
        perturb: (args, i32 salt) -> args', a cheap value-perturbation making
            each iteration's inputs distinct (e.g. add salt to an index array
            modulo the table size). Must preserve shapes/dtypes.
        iters: loop iterations per dispatch (RTT amortization).
        calls: timed dispatches; the median per-iteration time is returned.
    """
    import jax
    import jax.numpy as jnp

    def checksum(out):
        # full-sum reduction: every output element feeds the carry, so XLA
        # cannot dead-code-eliminate any part of the op (a first-element
        # checksum would let it slice-fuse gathers down to one row). Costs
        # one extra read pass over the output — identical across variants.
        leaves = jax.tree_util.tree_leaves(out)
        total = jnp.float32(0)
        for leaf in leaves:
            total = total + jnp.sum(leaf.astype(jnp.float32))
        return total

    @jax.jit
    def run(salt, a):
        def body(i, acc):
            ai = perturb(a, salt + i)
            return acc + checksum(fn(*ai))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    # On the axon tunnel, jax.block_until_ready on a SMALL output returns
    # without waiting for device execution (measured in
    # scripts/probe_timing2.py: a fori_loop-of-sorts reduced to a scalar
    # reads 0.0 ms under block_until_ready but ~15 ms/iter when the result
    # is fetched to host). So completion is forced by np.asarray host
    # fetch. The FIRST host fetch in a process pays a one-time ~26 s
    # channel-setup cost — absorbed by the warmup calls below.
    salt0 = np.int32(1)
    for w in range(warmup_calls):
        np.asarray(run(np.int32(salt0 + w), args))
    ts = []
    for c in range(calls):
        s = np.int32(1000 + c * iters)
        t0 = time.perf_counter()
        np.asarray(run(s, args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters
