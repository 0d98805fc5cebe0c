"""stvo_pl_tpu — TPU-native stereo visual odometry with point and line features.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PL-StVO
(rubengooj/stvo-pl): ORB-style point features, LSD/LBD-style line-segment
features, grid/window-constrained stereo + frame-to-frame matching, and robust
Gauss-Newton / Levenberg-Marquardt pose estimation — redesigned as dense,
fixed-shape, masked array programs that compile to a single XLA computation
per frame, batch over sequences with `vmap`, and scale over device meshes with
`shard_map` + collectives.

Reference capability map (file:line cites point into /root/reference):
  - L0 config/dataset       -> stvo_pl_tpu.config, stvo_pl_tpu.utils.dataset
  - L1 geometry/math        -> stvo_pl_tpu.ops.{se3,camera,robust,linalg}
  - L2 matching primitives  -> stvo_pl_tpu.ops.{hamming,matching}
  - L3 detectors/descriptors-> stvo_pl_tpu.ops.{fast,orb,lsd,lbd,image}
  - L4 per-frame pipeline   -> stvo_pl_tpu.models.frame
  - L5 VO engine            -> stvo_pl_tpu.models.{frontend,optimizer,keyframes}
  - L6 visualization        -> stvo_pl_tpu.utils.visualization
  - L7 CLI                  -> stvo_pl_tpu.cli
  - scale-out (new)         -> stvo_pl_tpu.parallel.{mesh,batched,ba}
"""

__version__ = "0.1.0"

from stvo_pl_tpu.config import VOConfig, load_config

__all__ = ["VOConfig", "load_config", "__version__"]
