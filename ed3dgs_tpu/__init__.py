"""ed3dgs_tpu — a TPU-native (JAX/XLA/Pallas) framework for deformable 3D Gaussian
splatting with per-Gaussian embeddings (E-D3DGS) and rasterized depth/normal
geometry (RaDe-GS), including NerSemble head-capture training with tongue-channel
handling and tetrahedra mesh extraction.

This is a ground-up re-architecture of the capabilities of the reference
CUDA/PyTorch pipeline (vladb99/E-D3DGS) for TPU hardware:

  * the differentiable tile rasterizer is built on depth-sorted masked
    cumulative-product alpha compositing (deterministic, autodiff-exact) with a
    Pallas TPU kernel for the hot path and a pure-XLA backend for CPU tests,
  * the Gaussian cloud lives in a fixed-capacity pytree with an alive-mask so
    densify/clone/split/prune are static-shape masked ops under jit,
  * multi-chip scaling uses jax.sharding.Mesh + shard_map with XLA collectives
    (no NCCL analogue needed).

Package layout:
  core/      pure math: SH, quaternions, camera matrices, EWA projection
  ops/       rasterizer backends + binning + KNN kernels
  models/    Gaussian parameter pytree + deformation network
  render/    high-level render() API (parity with gaussian_renderer.render)
  train/     losses, optimizer groups, densification, training loop
  data/      COLMAP/ply/scene loaders, cameras
  parallel/  mesh construction + sharded train/render steps
  config/    dataclass configs + python config-file loader
  mesh/      tetrahedra mesh extraction (Delaunay, marching tets)
  tools/     CLI entry points (train/render/metrics/mesh)
"""

__version__ = "0.1.0"
