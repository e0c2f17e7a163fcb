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
    if n_keep > 0:
        # Downsample FIRST, then estimate normals only at the kept points
        # with the FULL voxelized cloud as neighborhood support — the PCA
        # planes equal the reference's estimate-then-downsample order
        # (``Odometry.cpp:25-30``) at n_keep/out_capacity of the kernel
        # cost (the selection doesn't read normals, so the kept set is
        # identical either way).
        kept = voxel.random_downsample(down, n_keep, key)
        kept = pclib.compact_to(kept, keep_capacity)
        if needs_normals:
            kept = normals_ops.estimate_normals_at(kept, down, radius,
                                                   max_nn=max_nn)
        return kept
    if needs_normals:
        down = normals_ops.estimate_normals(down, radius, max_nn=max_nn)
    return down


class OdometryPending:
    """Device-side result of one async odometry step.

    Lets the mapper consume the odometry pose as a TRACED value (device-side
    motion prediction) and batch the device->host scalar pull of BOTH stages
    into one round-trip per scan — on a tunneled chip each separate blocking
    pull costs a full RTT (~32 ms).  ``finalize`` replays the exact host
    bookkeeping (gate print, float64 cumulative update, buffer push) once
    the values arrive.
    """
    __slots__ = ("owner", "timestamp", "fitness", "rmse", "T", "cum_new",
                 "ok", "is_initial")

    def __init__(self, owner, timestamp, fitness, rmse, T, cum_new, ok,
                 is_initial=False):
        self.owner = owner
        self.timestamp = timestamp
        self.fitness = fitness      # device scalar
        self.rmse = rmse            # device scalar
        self.T = T                  # device (4,4)
        self.cum_new = cum_new      # device (4,4): cumulative AFTER this scan
        self.ok = ok                # device bool: fitness gate
        self.is_initial = is_initial  # consumed a setInitialTransform


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
        self._cum_dev = jnp.eye(4)          # device mirror of the cumulative
        self._pending: list = []            # unfinalized OdometryPending, FIFO
        self.n_failed = 0                   # fitness-gate rejections (health)

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

    def add_range_scan_async(self, cloud: PointCloud, timestamp: float):
        """Dispatch one odometry step WITHOUT blocking on device results.

        Returns an ``OdometryPending`` (device scalars; host state updates
        deferred to ``finalize_pending``), or True for the first scan
        (accepted immediately, no registration), or False for an
        out-of-order drop.  ``Odometry.cpp:32-79`` semantics.
        """
        if self.prev is None:
            processed = self.preprocess(cloud)
            self.prev = self.registration.prepare_target(processed)
            self.odom_buffer.push(timestamp, self.odom_to_range_sensor_cumulative)
            self.last_timestamp = timestamp
            self._cum_dev = jnp.asarray(self.odom_to_range_sensor_cumulative,
                                        jnp.float32)
            return True

        if self.last_timestamp is not None and timestamp < self.last_timestamp:
            print("LIDAR ODOMETRY WARNING: measurements came out of order!")
            return False

        processed = self.preprocess(cloud)
        prepared = self.registration.prepare_target(processed)
        # Register PREV (source) against NEW (target), init = identity.
        result = self.registration.register(self.prev.cloud, prepared, jnp.eye(4))
        ok = result.fitness > 0.1   # magic gate, Odometry.cpp:51
        from open3d_slam_tpu.utils import se3
        if self._initial_transform is not None:
            # setInitialTransform already assigned the cumulative host-side
            # (Odometry.cpp:102-110); the device mirror holds it too, and a
            # success consumes the flag WITHOUT composing T^-1.
            cum_new = self._cum_dev
        else:
            # cumulative *= T^-1  (Odometry.cpp:72)
            cum_new = jnp.where(
                ok, self._cum_dev @ se3.inverse(result.transformation),
                self._cum_dev)
        self._cum_dev = cum_new
        self.prev = prepared
        pending = OdometryPending(self, timestamp, result.fitness,
                                  result.inlier_rmse, result.transformation,
                                  cum_new, ok,
                                  is_initial=self._initial_transform is not None)
        # Start the D2H copies NOW: by finalize time the scalars are already
        # host-side and the blocking pull costs ~0 instead of a tunnel RTT.
        from open3d_slam_tpu.utils.device import prefetch_to_host
        prefetch_to_host(pending.fitness, pending.rmse, pending.T)
        self._pending.append(pending)
        self.last_timestamp = timestamp
        return pending

    def finalize_pending(self, pulled=None, upto: Optional[float] = None) -> bool:
        """Resolve queued async results into EXACT host state (float64
        cumulative, gate prints, buffer pushes) — one device pull for the
        whole queue unless ``pulled`` (pre-fetched values, in queue order)
        is provided by the caller's batched transfer.  ``upto`` limits
        finalization to pendings with timestamp <= upto (pipelined replay
        keeps the next scan's odometry in flight).  Returns the last
        finalized step's isOdomOkay."""
        if not self._pending:
            return True
        if upto is None:
            pend, self._pending = self._pending, []
        else:
            pend = [q for q in self._pending if q.timestamp <= upto]
            self._pending = [q for q in self._pending if q.timestamp > upto]
        if not pend:
            return True
        if pulled is None:
            pulled = jax.device_get([(p.fitness, p.rmse, p.T) for p in pend])
        last_ok = True
        for p, (fitness, rmse, T) in zip(pend, pulled):
            fitness = float(fitness)
            last_ok = fitness > 0.1
            if not last_ok:
                self.n_failed += 1
                print(f"Odometry failed! fitness={fitness:.3f} "
                      f"rmse={float(rmse):.3f}")
                continue
            if self._initial_transform is not None:
                self.odom_to_range_sensor_cumulative = self._initial_transform.copy()
                self._initial_transform = None
            else:
                # float64 host composition (the float32 device mirror is
                # only the mapper's motion-prediction input).
                self.odom_to_range_sensor_cumulative = (
                    self.odom_to_range_sensor_cumulative @
                    np.linalg.inv(np.asarray(T, np.float64)))
            self.odom_buffer.push(p.timestamp, self.odom_to_range_sensor_cumulative)
        # Re-anchor the device mirror on the float64 host chain so float32
        # composition drift never accumulates across scans.  In-flight
        # pendings already chained their cum_new off the old mirror; rebase
        # them on the fresh anchor (a 4x4 matmul + select per pending — in
        # steady pipelined replay that is ONE pending) so the mapper's
        # motion prediction always reads an anchored pose.
        cum = jnp.asarray(self.odom_to_range_sensor_cumulative, jnp.float32)
        for q in self._pending:
            if q.is_initial:
                cum = q.cum_new      # initial transform resets the chain
            else:
                from open3d_slam_tpu.utils import se3
                cum = jnp.where(q.ok, cum @ se3.inverse(q.T), cum)
            q.cum_new = cum
        self._cum_dev = cum
        return last_ok

    def add_range_scan(self, cloud: PointCloud, timestamp: float) -> bool:
        """Process one scan; returns isOdomOkay (``Odometry.cpp:32-79``).
        Blocking form: dispatch + immediate finalize (one device pull)."""
        r = self.add_range_scan_async(cloud, timestamp)
        if isinstance(r, OdometryPending):
            return self.finalize_pending()
        return r

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
        self._cum_dev = jnp.asarray(self.odom_to_range_sensor_cumulative,
                                    jnp.float32)
