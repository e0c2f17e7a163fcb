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

# TPU MXU matmuls default to bf16 input precision.  For a geometry pipeline
# that is a CORRECTNESS bug, not a performance knob: rotating points with a
# bf16-rounded 3x3 matrix perturbs coordinates by ~1e-2 m at |p|~30 m, which
# makes the Gauss-Newton registration loops dither around the optimum (50
# iterations instead of ~5, with occasional divergence into a wrong basin —
# observed on the VLP-16 pipeline).  Require full f32 everywhere; the
# throughput-critical distance/Gram matmuls already request HIGHEST
# explicitly, and the Pallas kernels manage their own precision.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
