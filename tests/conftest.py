"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the JAX-standard substitute for multi-accelerator hardware in CI
(SURVEY.md section 4): XLA_FLAGS=--xla_force_host_platform_device_count=8 gives
8 independent CPU devices so sharding/collective paths compile and execute.
Must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
