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


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("patch_capacity", "with_covs",
                                    "identity_order"))
def _patch_prepare(map_cloud: PointCloud, cropper, pose_t: jnp.ndarray,
                   cell, patch_capacity: int, with_covs: bool,
                   identity_order: bool = False):
    """Crop map patch at pose -> compact -> grid (+GICP covariances), as one
    jitted program (the per-scan target prep of scan2map).  The compaction
    preserves the submap's packed-voxel order, so with ``identity_order``
    the patch stays spatially coherent for the fused kernel's tile skip."""
    from open3d_slam_tpu.models.cloud_registration import _prepare_target_fn
    from open3d_slam_tpu.utils import pointcloud as pclib
    patch = map_cloud.with_(
        mask=map_cloud.mask & cropper.is_inside(map_cloud.points, pose_t))
    patch = pclib.compact_to(patch, patch_capacity)
    return _prepare_target_fn(patch, cell, with_covs, identity_order)


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

        One fused jitted program (odometry.preprocess_chain); compacted
        after the random downsample so the match/merge clouds carry the
        real point count's capacity."""
        from open3d_slam_tpu.models.odometry import preprocess_chain
        from open3d_slam_tpu.utils import pointcloud as pclib
        sp = self.params.scan_processing
        ratio = sp.down_sampling_ratio
        n_keep = (int(round(self.processed_capacity * ratio))
                  if ratio < 1.0 else 0)
        self._rng_key, sub = jax.random.split(self._rng_key)
        icp = self.params.scan_matcher.icp
        return preprocess_chain(
            cloud, self.map_builder_cropper,
            jnp.float32(icp.max_distance_knn), sub,
            voxel_size=sp.voxel_size, out_capacity=self.processed_capacity,
            n_keep=n_keep,
            keep_capacity=pclib.padded_capacity(max(n_keep, 1)),
            needs_normals=self.registration.needs_normals(),
            max_nn=icp.knn)

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
        capacity.  Overflow keeps a uniform stride of patch points.  The
        crop+compact+grid+covariance prep is one jitted program."""
        pose_t = jnp.asarray(map_to_range_sensor, jnp.float32)[:3, 3]
        cell = max(self.params.scan_matcher.icp.max_correspondence_distance, 1e-6)
        prepared = _patch_prepare(
            active_submap.map_cloud, self.scan_matcher_cropper, pose_t,
            jnp.float32(cell), self.patch_capacity,
            self.registration.reg_type == "GeneralizedIcp",
            jax.default_backend() == "tpu")
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
