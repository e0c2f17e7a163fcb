"""Scan-to-map registration: dual-crop preprocessing + ICP against a map patch.

Mirror of the reference's ``ScanToMapIcp``
(``src/ScanToMapRegistration.cpp:21-102``):
  * ``preprocess``: mapBuilder crop -> voxelize -> normals/covs -> random
    downsample = the *merge* cloud;
  * narrow crop with the scanProcessing cropper (at identity, i.e. sensor
    frame) = the *match* cloud;
  * ``scanToMapRegistration``: crop a patch of the active submap around the
    current pose with the scanProcessing cropper, then register match-cloud
    against the patch with the odometry-predicted initial guess.

TPU design: the map patch is a mask over the submap's fixed-capacity cloud;
the registration target grid is built over the masked cloud directly (the
hash grid skips invalid points), so no compaction pass is needed.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.models.cloud_registration import (
    CloudRegistrationStrategy, PreparedCloud)
from open3d_slam_tpu.models.submap import Submap
from open3d_slam_tpu.ops import croppers, registration as reg_ops, voxel
from open3d_slam_tpu.utils.config import (CloudRegistrationParameters,
                                          MapperParameters)
from open3d_slam_tpu.utils.pointcloud import PointCloud


class ProcessedScans(NamedTuple):
    match: PointCloud
    merge: PointCloud


class ScanToMapIcp:
    def __init__(self, params: MapperParameters, processed_capacity: int = 16384,
                 patch_capacity: int = 65536):
        self.params = params
        self.processed_capacity = processed_capacity
        self.patch_capacity = patch_capacity
        # toCloudRegistrationType (ScanToMapRegistration.cpp:91-128).
        cr = CloudRegistrationParameters(
            reg_type=params.scan_matcher.scan_to_map_reg_type,
            icp=params.scan_matcher.icp)
        self.registration = CloudRegistrationStrategy(cr.reg_type, cr.icp)
        self.map_builder_cropper = croppers.from_cropper_params(params.map_builder.cropper)
        self.scan_matcher_cropper = croppers.from_cropper_params(params.scan_processing.cropper)
        self._rng_key = jax.random.PRNGKey(1)

    def preprocess(self, cloud: PointCloud) -> PointCloud:
        """``ScanToMapIcp::preprocess`` (``ScanToMapRegistration.cpp:35-41``).

        Compacted after the random downsample (see LidarOdometry.preprocess)
        so the match/merge clouds carry the real point count's capacity."""
        from open3d_slam_tpu.utils import pointcloud as pclib
        sp = self.params.scan_processing
        cropped = self.map_builder_cropper.crop(cloud)
        down = voxel.voxel_downsample(cropped, sp.voxel_size,
                                      out_capacity=self.processed_capacity)
        down = self.registration.estimate_normals_if_needed(down)
        if sp.down_sampling_ratio < 1.0:
            self._rng_key, sub = jax.random.split(self._rng_key)
            n_keep = int(round(self.processed_capacity * sp.down_sampling_ratio))
            down = voxel.random_downsample(down, n_keep, sub)
            down = pclib.compact_to(down, pclib.padded_capacity(n_keep))
        return down

    def process_for_scan_matching_and_merging(self, cloud: PointCloud,
                                              map_to_range_sensor: np.ndarray) -> ProcessedScans:
        """(``ScanToMapRegistration.cpp:42-54``): wide = merge, narrow = match."""
        wide = self.preprocess(cloud)
        narrow = self.scan_matcher_cropper.crop(wide)  # pose = identity
        return ProcessedScans(match=narrow, merge=wide)

    def scan_to_map_registration(self, scan: PointCloud, active_submap: Submap,
                                 map_to_range_sensor: np.ndarray,
                                 initial_guess: np.ndarray) -> reg_ops.RegistrationResult:
        """(``ScanToMapRegistration.cpp:55-62``): crop map patch at current
        pose, register scan against it.

        Like the reference — which builds the ICP KD-tree over the CROPPED
        patch, not the whole submap — the patch is compacted to
        ``patch_capacity`` before the target grid/covariances are built, so
        every ICP sweep scales with the patch size rather than the submap
        capacity.  Overflow keeps a uniform stride of patch points."""
        from open3d_slam_tpu.utils import pointcloud as pclib
        pose_t = jnp.asarray(map_to_range_sensor, jnp.float32)[:3, 3]
        patch = active_submap.map_cloud.with_(
            mask=active_submap.map_cloud.mask &
            self.scan_matcher_cropper.is_inside(active_submap.map_cloud.points, pose_t))
        patch = pclib.compact_to(patch, self.patch_capacity)
        prepared = self.registration.prepare_target(patch)
        return self.registration.register(
            scan, prepared, jnp.asarray(initial_guess, jnp.float32))

    def is_merge_scan_valid(self, pc: PointCloud) -> bool:
        """(``ScanToMapRegistration.cpp:64-80``)."""
        t = self.params.scan_matcher.scan_to_map_reg_type
        if t == "PointToPointIcp":
            return True
        return pc.normals is not None

    def prepare_initial_map(self, pc: PointCloud) -> PointCloud:
        """(``ScanToMapRegistration.cpp:81-84``): normals for a loaded map."""
        return self.registration.estimate_normals_if_needed(pc)


def scan_to_map_registration_factory(params: MapperParameters,
                                     processed_capacity: int = 16384,
                                     patch_capacity: int = 65536) -> ScanToMapIcp:
    return ScanToMapIcp(params, processed_capacity, patch_capacity)
