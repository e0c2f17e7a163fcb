"""LiDAR odometry (scan-to-scan).

Mirror of the reference's ``LidarOdometry`` (``src/Odometry.cpp:18-112``):
  * preprocess: crop -> voxelize -> estimate normals/covs -> random downsample
    (``Odometry.cpp:25-30`` order);
  * register the PREVIOUS processed cloud against the NEW scan
    (``registerClouds(cloudPrev_, preProcessed, I)``, ``Odometry.cpp:47``);
  * fitness gate ``result.fitness > 0.1`` (``Odometry.cpp:51``);
  * cumulative pose update ``odomToRangeSensorCumulative *= T^-1``
    (``Odometry.cpp:72``);
  * in-order timestamps enforced; pose buffer for the mapper handoff.

TPU design: the hash grid + normals of the new scan are computed once on
device and become both the registration target now and the stored "previous
cloud" next step, so each scan is preprocessed exactly once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from open3d_slam_tpu.models.buffers import TransformInterpolationBuffer
from open3d_slam_tpu.models.cloud_registration import (
    CloudRegistrationStrategy, PreparedCloud, cloud_registration_factory)
from open3d_slam_tpu.ops import croppers, normals as normals_ops, voxel
from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.utils.config import OdometryParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud


@partial(jax.jit, static_argnames=("voxel_size", "out_capacity", "n_keep",
                                   "keep_capacity", "needs_normals", "max_nn"))
def preprocess_chain(cloud: PointCloud, cropper, radius, key,
                     voxel_size: float, out_capacity: int, n_keep: int,
                     keep_capacity: int, needs_normals: bool,
                     max_nn: int) -> PointCloud:
    """crop -> voxelize -> normals -> random downsample -> compact, as ONE
    jitted program (``Odometry.cpp:25-30`` order).  Shared by odometry and
    the mapper's scan preprocessing; a fused program both avoids per-op
    eager dispatches through the device tunnel and caches as a single
    executable."""
    cropped = cropper.crop(cloud)
    down = voxel.voxel_downsample(cropped, voxel_size,
                                  out_capacity=out_capacity)
    if needs_normals:
        down = normals_ops.estimate_normals(down, radius, max_nn=max_nn)
    if n_keep > 0:
        down = voxel.random_downsample(down, n_keep, key)
        down = pclib.compact_to(down, keep_capacity)
    return down


class LidarOdometry:
    def __init__(self, params: Optional[OdometryParameters] = None,
                 processed_capacity: int = 16384,
                 buffer_size_limit: int = 2000):
        self.params = params or OdometryParameters()
        self.processed_capacity = processed_capacity
        self.registration = cloud_registration_factory(self.params.scan_matcher)
        self.cropper = croppers.from_cropper_params(self.params.scan_processing.cropper)
        self.odom_to_range_sensor_cumulative = np.eye(4)
        self.odom_buffer = TransformInterpolationBuffer(buffer_size_limit)
        self.prev: Optional[PreparedCloud] = None
        self.last_timestamp: Optional[float] = None
        self._initial_transform: Optional[np.ndarray] = None
        self._rng_key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------

    def preprocess(self, cloud: PointCloud) -> PointCloud:
        """Crop -> voxelize -> normals -> random downsample (``Odometry.cpp:25-30``).

        One fused jitted program (``preprocess_chain``).  The downsampled
        cloud is COMPACTED to the smallest tileable capacity holding
        ``n_keep`` points: every downstream device program (grid build,
        fused ICP sweeps) then scales with the real matching-cloud size
        instead of the pre-downsample capacity."""
        sp = self.params.scan_processing
        ratio = sp.down_sampling_ratio
        n_keep = (int(round(self.processed_capacity * ratio))
                  if ratio < 1.0 else 0)
        self._rng_key, sub = jax.random.split(self._rng_key)
        return preprocess_chain(
            cloud, self.cropper,
            jnp.float32(self.params.scan_matcher.icp.max_distance_knn), sub,
            voxel_size=sp.voxel_size, out_capacity=self.processed_capacity,
            n_keep=n_keep,
            keep_capacity=pclib.padded_capacity(max(n_keep, 1)),
            needs_normals=self.registration.needs_normals(),
            max_nn=self.params.scan_matcher.icp.knn)

    # ------------------------------------------------------------------

    def add_range_scan(self, cloud: PointCloud, timestamp: float) -> bool:
        """Process one scan; returns isOdomOkay (``Odometry.cpp:32-79``)."""
        if self.prev is None:
            processed = self.preprocess(cloud)
            self.prev = self.registration.prepare_target(processed)
            self.odom_buffer.push(timestamp, self.odom_to_range_sensor_cumulative)
            self.last_timestamp = timestamp
            return True

        if self.last_timestamp is not None and timestamp < self.last_timestamp:
            print("LIDAR ODOMETRY WARNING: measurements came out of order!")
            return False

        processed = self.preprocess(cloud)
        prepared = self.registration.prepare_target(processed)
        # Register PREV (source) against NEW (target), init = identity.
        result = self.registration.register(self.prev.cloud, prepared, jnp.eye(4))
        # ONE device->host transfer for all result scalars (each separate
        # pull pays a full tunnel round-trip).
        fitness, rmse, T = jax.device_get(
            (result.fitness, result.inlier_rmse, result.transformation))
        fitness = float(fitness)
        is_odom_okay = fitness > 0.1  # magic gate, Odometry.cpp:51
        if not is_odom_okay:
            print(f"Odometry failed! fitness={fitness:.3f} "
                  f"rmse={float(rmse):.3f}")
            self.prev = prepared
            return False

        T = np.asarray(T, np.float64)
        if self._initial_transform is not None:
            self.odom_to_range_sensor_cumulative = self._initial_transform.copy()
            self._initial_transform = None
        else:
            # cumulative *= T^-1  (Odometry.cpp:72)
            self.odom_to_range_sensor_cumulative = (
                self.odom_to_range_sensor_cumulative @ np.linalg.inv(T))
        self.prev = prepared
        self.odom_buffer.push(timestamp, self.odom_to_range_sensor_cumulative)
        self.last_timestamp = timestamp
        return True

    # ------------------------------------------------------------------

    def get_odom_to_range_sensor(self, t: float) -> np.ndarray:
        return self.odom_buffer.lookup_clamped(t)

    def get_pre_processed_cloud(self) -> Optional[PointCloud]:
        return None if self.prev is None else self.prev.cloud

    def has_processed_measurements(self) -> bool:
        return not self.odom_buffer.empty()

    def set_initial_transform(self, T: np.ndarray):
        """``setInitialTransform`` (``Odometry.cpp:102-110``)."""
        self._initial_transform = np.asarray(T, np.float64).copy()
        self.odom_to_range_sensor_cumulative = np.asarray(T, np.float64).copy()
