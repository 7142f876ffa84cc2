"""pislamfusion_tpu — a TPU-native (JAX/XLA/Pallas) drone real-time mapping framework.

A from-scratch rebuild of the capabilities of pi-slam-fusion
(Immortalqx/pi-slam-fusion): monocular keyframe SLAM (feature extraction,
matching, RANSAC initialization/PnP tracking, triangulating mapper with
Schur-complement LM bundle adjustment, GPS SIM3 fusion, loop closing) feeding
an incremental orthomosaic engine (plane-projected homography warping with
tiled Laplacian multi-band blending) — designed TPU-first: fixed-shape padded
array programs, Pallas kernels for the image hot paths, MXU matmuls for
matching/BoW, vmapped RANSAC hypothesis batches, and `jax.sharding` meshes for
scale-out.

Layer map (mirrors SURVEY.md section 1 of the reference):
  core/      — config (Svar-compatible), cameras, geodesy, registry, profiler,
               pub/sub messenger (GSLAM/GSLAM/core equivalents)
  ops/       — jitted array kernels: lie groups, image pyramids, features,
               matching, RANSAC estimators, triangulation, bundle adjustment,
               mosaic warp/blend (the SiftGPU / g2o / UtilGPU.cu equivalents)
  models/    — the SLAM system (tracker/mapper/initializer/loop closing) and
               the Map2D mosaic engine (GSLAM-DIYSLAM / Map2DFusion equivalents)
  io/        — dataset adapters (rtm, npudronemap, kitti, tum, euroc, cvmono)
  parallel/  — device-mesh sharding of frame batches, hypothesis batches and
               tile batches over ICI
  utils/     — padding helpers, export (ply/trajectory/png), logging
"""

__version__ = "0.1.0"
