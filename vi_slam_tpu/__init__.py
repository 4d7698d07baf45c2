"""vi_slam_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
KMS-TEAM/vi_slam (an ORB-SLAM3-derived C++/CUDA stack): ORB feature
frontend, descriptor matching, stereo/mono/VIO tracking, local & global
bundle adjustment, place recognition, and loop closing —
expressed as batched array programs over static shapes, with pjit/shard_map
distribution for global BA.

Design stance (see SURVEY.md §7):
  * map state is struct-of-arrays with alive-masks, not an object graph
  * dynamic control flow on host, numerics on device under jit
  * optimizers are Gauss-Newton/LM with explicit Schur complement
  * hot kernels are Pallas where XLA fusion is not enough
"""

__version__ = "0.1.0"

from vi_slam_tpu.utils import config as config  # noqa: F401
