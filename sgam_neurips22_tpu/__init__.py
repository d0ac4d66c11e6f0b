"""SGAM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of SGAM.

"SGAM: Building a Virtual 3D World through Simultaneous Generation and
Mapping" (NeurIPS 2022). This package re-implements the full capability
surface of the reference PyTorch codebase (yshen47/SGAM_NeurIPS22) with a
TPU-first architecture:

- NHWC tensor layout, bf16-friendly convs tiled onto the MXU.
- The per-frame generate->map->re-query loop is a single jitted function over
  on-device state (no PNG round-trips between steps).
- The 3D map is an on-device TSDF voxel grid (integrate + raycast in XLA)
  instead of Open3D C++ + GL offscreen rendering.
- Data parallelism via jax.sharding.Mesh + NamedSharding instead of DDP/NCCL.
- Hot ops (VQ codebook search) have fused Pallas kernels.

Layer map mirrors SURVEY.md section 1:
  core/      config + registry + checkpoint I/O       (ref L0)
  geometry/  camera, warping, splat, depth codecs      (ref L1)
  models/    VQGAN encoder/decoder/quantizer/VQModel   (ref L2+L3)
  training/  losses, GAN step, data pipeline           (ref L4)
  pipeline/  scene generation + mapping loop           (ref L5)
  mapping/   TSDF volume + point cloud export          (ref Open3D surface)
  parallel/  mesh + sharding helpers                   (ref DDP surface)
  ops/       Pallas kernels
  utils/     metrics, image io, logging
"""

__version__ = "0.1.0"
