"""FLAGSHIP-scale data-parallel equivalence on the virtual 8-CPU mesh.

tests/test_parallel.py proves the DP invariant (sharded step == single-device
step, the guarantee the reference gets from DDP, /root/reference/train.py:149-168
and lse_pipeline.py:96-98) at tiny shapes. This file proves it at the REAL
shapes the scale-out projection leans on: the full 16-level 2^19-entry hash
table, 3512-ray batches, deblur x4 + spline camera opt — the exact program
`__graft_entry__.dryrun_multichip` compiles and `bench.py --mesh` times.

One step only; marked slow (flagship compile on the CPU backend dominates).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsenerf_tpu.parallel import mesh as mesh_lib


@pytest.mark.slow
def test_flagship_sharded_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from __graft_entry__ import _flagship

    trainer, state = _flagship(tiny=False, production=True)
    mesh = mesh_lib.make_mesh(8)
    mesh_lib.round_rays_to_mesh(trainer.dm.config, mesh)

    batch = trainer.dm.next_train(0)
    train_step = trainer.make_train_step()

    # the step donates state buffers; rebuild the deterministic initial
    # state for the sharded run instead of reusing `state`
    state_r = mesh_lib.replicate(trainer.setup(jax.random.PRNGKey(0)), mesh)

    state1, metrics1 = train_step(state, jax.device_put(batch))
    loss1 = float(metrics1["loss"])
    assert np.isfinite(loss1)

    state8, metrics8 = train_step(state_r, mesh_lib.shard_batch(batch, mesh))
    loss8 = float(metrics8["loss"])
    assert np.isfinite(loss8)
    # bf16 forward + f32 loss reduction: the 8-way psum reassociates the
    # ray-sum, so agreement is to reduction precision, not bitwise
    assert loss8 == pytest.approx(loss1, rel=1e-3)

    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    assert len(p1) == len(p8)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-5,
        )
