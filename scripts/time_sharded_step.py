"""Time the sharded train step on the virtual 8-CPU mesh (VERDICT r2 #8).

Measures the collective-overhead SHAPE of the DP path — absolute numbers are
CPU numbers, but the comparison (1-device vs 8-device-sharded step on
identical global batch; per-step vs scan-16 dispatch) shows what the mesh
costs beyond the math: gradient psum, sharded batch layout, scan composition.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/time_sharded_step.py
"""

import os
import os.path as osp
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lsenerf_tpu.parallel import mesh as mesh_lib  # noqa: E402


def build(batch_rays=512):
    from lsenerf_tpu.data.datamanager import DataManagerConfig, MultiCamDataManager
    from lsenerf_tpu.data.synthetic import make_synthetic_scene
    from lsenerf_tpu.engine.trainer import CameraOptConfig, Trainer, TrainerConfig
    from lsenerf_tpu.models import field as field_lib
    from lsenerf_tpu.models import lsenerf as model_lib
    from lsenerf_tpu.ops import hash_encoding as he
    from lsenerf_tpu.ops import occupancy as occ_lib

    model_cfg = model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            hash=he.HashEncodingConfig(
                num_levels=8, log2_hashmap_size=14, base_res=8, max_res=256
            ),
            use_contraction=False,
        ),
        grid=occ_lib.OccGridConfig(resolution=32, levels=1),
        max_samples=32,
        max_candidates=128,
        far_plane=5.0,
        render_step_size=0.05,
    )
    col, evs = make_synthetic_scene(n_cams=6, h=32, w=32, focal=40.0)
    dm = MultiCamDataManager(
        DataManagerConfig(train_num_rays_per_batch=batch_rays, rgb_frac=0.66),
        col, evs,
    )
    trainer_cfg = TrainerConfig(
        col_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="ns"),
        evs_cam_opt=CameraOptConfig(mode="SO3xR3", optim_type="ns"),
    )
    trainer = Trainer(trainer_cfg, model_cfg, dm)
    return trainer


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    assert len(jax.devices()) == 8, jax.devices()
    trainer = build()
    dm = trainer.dm
    mesh = mesh_lib.make_mesh(8)
    mesh_lib.round_rays_to_mesh(dm.config, mesh)

    step = trainer.make_train_step()
    batch = dm.next_train(0)

    # single-device (all data on device 0)
    s1 = trainer.setup(jax.random.PRNGKey(0))
    b1 = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    def run1(s):
        return step(s, dict(b1))

    # the step donates state; re-make per timing loop via closure trick:
    # time state-chained steps (the realistic pattern)
    def chain(step_fn, s0, b, iters=30):
        s, m = step_fn(s0, b)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step_fn(s, b)
        jax.block_until_ready(m["loss"])
        return (time.perf_counter() - t0) / iters * 1000.0

    ms_1dev = chain(step, s1, b1)

    s8 = mesh_lib.replicate(trainer.setup(jax.random.PRNGKey(0)), mesh)
    b8 = mesh_lib.shard_batch(batch, mesh)
    ms_8dev = chain(step, s8, b8)

    K = 8
    steps_multi = trainer.make_train_step_multi(K)
    stacked = dm.next_train_stack(0, K)
    sb1 = {k: jax.device_put(np.asarray(v)) for k, v in stacked.items()}
    s1b = trainer.setup(jax.random.PRNGKey(0))
    ms_scan1 = chain(steps_multi, s1b, sb1, iters=8) / K
    s8b = mesh_lib.replicate(trainer.setup(jax.random.PRNGKey(0)), mesh)
    sb8 = mesh_lib.shard_batch_stacked(stacked, mesh)
    ms_scan8 = chain(steps_multi, s8b, sb8, iters=8) / K

    print(f"1-device step:            {ms_1dev:8.2f} ms")
    print(f"8-device sharded step:    {ms_8dev:8.2f} ms "
          f"(overhead {ms_8dev - ms_1dev:+.2f} ms: psum + layout)")
    print(f"1-device scan-{K} /step:   {ms_scan1:8.2f} ms")
    print(f"8-device scan-{K} /step:   {ms_scan8:8.2f} ms "
          f"(scan+mesh compose, VERDICT r2 #8)")


if __name__ == "__main__":
    main()
