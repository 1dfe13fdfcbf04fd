"""Retry helper for flaky remote-TPU compile backends.

The axon-tunneled chip in this environment intermittently SIGILLs its
compile helper on the first compile of a fresh process (especially right
after another process crashed or was killed mid-compile); the client sees a
JaxRuntimeError and the tunnel needs a cooldown before it recovers. This
wrapper makes first-compile paths robust; on healthy local TPU runtimes it
is a no-op pass-through.
"""

from __future__ import annotations

import time


def with_tpu_retry(fn, *args, attempts: int = 5, cooldown_s: float = 90.0, **kwargs):
    """Call fn(*args, **kwargs), retrying on backend runtime errors."""
    last = None
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            name = type(e).__name__
            if "RuntimeError" not in name and "XlaRuntimeError" not in name:
                raise
            last = e
            if attempt < attempts - 1:
                print(
                    f"[tpu-retry] compile/exec failed ({name}); "
                    f"cooldown {cooldown_s:.0f}s, attempt {attempt + 2}/{attempts}"
                )
                time.sleep(cooldown_s)
    raise last


def warmup(cooldown_s: float = 90.0, attempts: int = 5):
    """Run a trivial jit to absorb the flaky first compile."""
    import jax
    import jax.numpy as jnp

    def tiny():
        return jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))

    with_tpu_retry(tiny, attempts=attempts, cooldown_s=cooldown_s)
