"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the JAX-standard substitute for multi-accelerator hardware in CI
(SURVEY.md section 4): 8 independent CPU devices so sharding/collective paths
compile and execute.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
overrides the JAX_PLATFORMS env var, so we must force the platform via
jax.config (which wins over both) before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persist XLA:CPU compiles across runs — the flagship-shape programs
# (tests/test_parallel_flagship.py, the multichip dryrun) take minutes to
# compile and dominate suite wall time on this 1-core box
_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_ambient_mesh():
    """parallel.mesh.replicate activates the AMBIENT mesh (jax.set_mesh)
    that selects the shard-mapped table backward; reset it between tests so
    single-device tests never trace under a mesh some earlier test set.
    (jit keys its trace cache on the ambient mesh, so a stale mesh cannot
    corrupt results — this is purely about exercising the intended path.)"""
    yield
    from lsenerf_tpu.parallel import mesh as mesh_lib

    mesh_lib.deactivate()
