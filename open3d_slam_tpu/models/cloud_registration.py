"""Cloud-registration strategy: the polymorphic ICP dispatch.

Mirror of the reference's ``CloudRegistration`` hierarchy + factory
(``src/CloudRegistration.cpp:16-100``): PointToPlaneIcp / PointToPointIcp /
GeneralizedIcp, each owning its normal/covariance estimation policy
(``estimateNormalsOrCovariancesIfNeeded``) and registration call.

The strategy's jitted pieces take/return fixed-capacity pytrees; the class
itself is thin host-side glue so the odometry and mapper models stay
registration-type agnostic.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops import hashgrid, normals as normals_ops, registration
from open3d_slam_tpu.ops.hashgrid import HashGrid
from open3d_slam_tpu.utils.config import CloudRegistrationParameters, IcpParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud


class PreparedCloud(NamedTuple):
    """A cloud readied for use as a registration *target*: grid + per-point
    data in grid order."""
    cloud: PointCloud
    grid: HashGrid
    covs_sorted: Optional[jnp.ndarray] = None  # GICP only


@partial(jax.jit, static_argnames=("with_covs", "identity_order"))
def _prepare_target_fn(pc: PointCloud, cell, with_covs: bool,
                       identity_order: bool = False) -> PreparedCloud:
    """One program: grid build (+ GICP covariances, gathered in grid order).
    Jitted as a whole so the build/covariance/gather chain is one device
    dispatch instead of several eager ops.

    ``identity_order`` (TPU): skip the hash argsort + gathers and keep the
    input point order.  The TPU registration paths never hash-probe (NN is
    fused/brute-force, which only needs the validity marker), and the
    pipeline's clouds arrive in packed-voxel-key order from
    voxel_downsample — spatially COHERENT, which is exactly what the fused
    kernel's AABB tile skip wants.  A hash sort would scatter neighbors
    across the array and defeat it."""
    if identity_order:
        n = pc.capacity
        grid = hashgrid.HashGrid(
            hashes_sorted=jnp.where(pc.mask, 0, hashgrid.INT32_MAX),
            points_sorted=pc.points,
            normals_sorted=pc.normals,
            order=jnp.arange(n, dtype=jnp.int32),
            cell_size=jnp.asarray(cell, jnp.float32),
        )
        covs_sorted = (normals_ops.covariances_from_normals(pc)
                       if with_covs else None)
        return PreparedCloud(cloud=pc, grid=grid, covs_sorted=covs_sorted)
    grid = hashgrid.build(pc, cell_size=cell)
    covs_sorted = None
    if with_covs:
        covs = normals_ops.covariances_from_normals(pc)
        covs_sorted = covs[grid.order]
    return PreparedCloud(cloud=pc, grid=grid, covs_sorted=covs_sorted)


class CloudRegistrationStrategy:
    """One of PointToPlaneIcp | PointToPointIcp | GeneralizedIcp."""

    def __init__(self, reg_type: str, icp: IcpParameters):
        if reg_type not in ("PointToPlaneIcp", "PointToPointIcp", "GeneralizedIcp"):
            raise ValueError(f"unknown registration type {reg_type!r}")
        self.reg_type = reg_type
        self.icp = icp

    # -- normal / covariance policy (estimateNormalsOrCovariancesIfNeeded) --

    def needs_normals(self) -> bool:
        return self.reg_type in ("PointToPlaneIcp", "GeneralizedIcp")

    def estimate_normals_if_needed(self, pc: PointCloud,
                                   sensor_position: Optional[jnp.ndarray] = None) -> PointCloud:
        """Hybrid-KNN PCA normals, normalized, oriented toward the sensor —
        matching ``KDTreeSearchParamHybrid(maxDistanceKnn_, knn_)`` usage."""
        if not self.needs_normals():
            return pc
        return normals_ops.estimate_normals(
            pc, radius=self.icp.max_distance_knn, max_nn=self.icp.knn,
            orientation_reference=sensor_position)

    # -- target preparation (grid build; GICP also needs covariances) --

    def prepare_target(self, pc: PointCloud) -> PreparedCloud:
        cell = max(self.icp.max_correspondence_distance, 1e-6)
        return _prepare_target_fn(pc, jnp.float32(cell),
                                  self.reg_type == "GeneralizedIcp",
                                  jax.default_backend() == "tpu")

    # -- registration (registerClouds) --

    def register(self, source: PointCloud, target: PreparedCloud,
                 init: jnp.ndarray) -> registration.RegistrationResult:
        if self.reg_type == "PointToPlaneIcp":
            return registration.icp_point_to_plane(
                source, target.grid, init,
                self.icp.max_correspondence_distance,
                max_iterations=self.icp.max_num_iter)
        if self.reg_type == "PointToPointIcp":
            return registration.icp_point_to_point(
                source, target.grid, init,
                self.icp.max_correspondence_distance,
                max_iterations=self.icp.max_num_iter)
        # GeneralizedIcp
        source_covs = normals_ops.covariances_from_normals(source)
        return registration.icp_generalized(
            source, source_covs, target.grid, target.covs_sorted, init,
            self.icp.max_correspondence_distance,
            max_iterations=self.icp.max_num_iter)


def cloud_registration_factory(p: CloudRegistrationParameters) -> CloudRegistrationStrategy:
    """Mirror of ``cloudRegistrationFactory`` (``CloudRegistration.cpp:85-100``)."""
    return CloudRegistrationStrategy(p.reg_type, p.icp)
