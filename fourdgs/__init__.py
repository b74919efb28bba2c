"""fourdgs — a TPU-native 4D Gaussian-splatting SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yanyan-li/4DGS-SLAM (PyTorch + CUDA, reference mounted read-only at
/root/reference): online RGB-D SLAM that tracks camera pose by
differentiable Gaussian-splat rendering, builds a 3D Gaussian map with
densification/pruning, and models dynamic objects with a control-node
deformation field supervised by optical flow.

Architecture (TPU-first, not a translation):
  - single host process; tracking and mapping are separately-jitted pure
    functions over an explicit SLAM state pytree (the reference's
    3-process + mp.Queue design collapses to function calls — its shipped
    configs run `single_thread: True` anyway, see reference
    utils/slam_frontend.py:665 and configs/rgbd/tum/*.yaml),
  - fixed-capacity Gaussian map with validity masks (XLA static shapes)
    instead of grow/shrink tensors + Adam-state surgery,
  - the differentiable rasterizer is a Pallas tile kernel pair
    (forward + analytic backward) under `jax.custom_vjp`; per-pair
    gradient buffers replace CUDA atomics (each sorted (tile,gaussian)
    pair is owned by exactly one tile program),
  - camera-pose gradients fall out of autodiff through the SE(3)
    retraction + projection chain rather than a hand-written `dL_dtau`
    kernel (reference cuda_rasterizer/backward.cu:150-346).

Subpackages:
  geometry   SE(3)/SO(3), projection, quaternions, spherical harmonics
  ops        Pallas + jnp compute kernels (rasterizer, knn, ssim, ...)
  models     Gaussian map, deformation fields, perception nets
  slam       tracking / mapping / keyframing / runner / losses
  data       dataset parsers (TUM, Bonn, CoFusion, synthetic)
  eval       ATE, PSNR/SSIM/LPIPS, reporting
  io         PLY + checkpoint save/load
  parallel   device-mesh sharding, multi-sequence batch eval
  utils      config system, logging, profiling
"""

__version__ = "0.1.0"
