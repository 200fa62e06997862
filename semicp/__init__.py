"""semicp — TPU-native semantic registration & SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kxhit/semantic-icp (Semantic Iterative Closest Point through
Expectation-Maximization, Parkison et al., BMVC 2018; see SURVEY.md).

Layer map (bottom-up):
  geom/      SE(3) Lie group math, closed-form 3x3 symmetric eigensolver
  cloud/     padded SoA point-cloud containers + GICP covariance estimation
  corr/      voxel-grid-hash correspondence engine (XLA + Pallas kernels)
  register/  EM semantic registration core (E-step weights, GN/LM M-step)
  oracle/    CPU-numpy reference implementation (parity oracle + baseline)
  data/      KITTI / SemanticKITTI ingestion, synthetic generators
  eval/      ATE / RPE trajectory evaluation
  slam/      keyframes, loop closure, pose-graph optimization, Schur BA
  dist/      device mesh, scan-pair batching, ring correspondence
  cli/       run_pair / run_odometry / run_slam / bench drivers
"""

__version__ = "0.1.0"

from semicp.config import Config, default_config  # noqa: F401
