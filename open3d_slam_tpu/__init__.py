"""open3d_slam_tpu — a TPU-native scan-matching and mapping engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
leggedrobotics/open3d_slam (reference mounted at /root/reference): LiDAR
odometry, scan-to-map refinement, voxel-hash map fusion with space carving,
submap-based pose-graph SLAM with FPFH+RANSAC loop closure, and
map-initialized localization — re-architected for TPU hardware
(batched Gauss-Newton, voxel-hash gather correspondence, psum-reduced
normal equations over device meshes).
"""

__version__ = "0.1.0"
