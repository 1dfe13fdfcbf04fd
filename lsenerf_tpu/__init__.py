"""LSENeRF-TPU: a TPU-native JAX framework for joint event-camera + RGB NeRF training.

A ground-up rebuild of the capabilities of ubc-vision/LSENeRF (reference mounted at
/root/reference) designed for TPU hardware: static-shape ray marching, XLA/Pallas hash
encoding, pjit/shard_map data parallelism over a device mesh, and a pure-functional
train step.

Layout:
  ops/       low-level differentiable math: Lie groups, slerp/splines, hash encoding,
             SH encoding, ray marching, compositing, occupancy grids, image metrics
  models/    field (hash-grid NeRF), appearance embeddings, intensity mappers, losses
  cameras/   camera model, ray generation, pose optimizers (SO3xR3 / spline / prevnext)
  data/      on-disk format parser (LSENeRF-formatter), datasets, pixel sampling,
             multi-camera batch assembly
  engine/    config tree, trainer, checkpointing, eval drivers, artifact writer
  parallel/  device-mesh sharding of the train step
"""

__version__ = "0.1.0"

EPS = 1e-6  # global epsilon, mirrors reference lse_nerf/utils.py:12 (EPS = 1e-6)
