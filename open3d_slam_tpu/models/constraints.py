"""Constraint types + odometry constraint builders.

Mirror of the reference's ``Constraint`` (``Constraints.hpp``) and
``constraint_builders.cpp``:
  * odometry constraints between parent/child submaps: overlap extraction ->
    optional ICP refine -> information matrix
    (``buildOdometryConstraint``/``buildConstraint``,
    ``constraint_builders.cpp:33-90``);
  * ``computeOdometryConstraints`` overloads (``:92-118``).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.ops import overlap as overlap_ops
from open3d_slam_tpu.ops import hashgrid, pose_graph as pg_ops, registration as reg_ops
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.pointcloud import PointCloud

# magic.hpp mirrors
VOXEL_SIZE_CORR_SEARCH_IF_ZERO = 0.04
ICP_RUN_UNTIL_CONVERGENCE_ITERS = 100
VOXEL_EXPANSION_OVERLAP = 20.0
VOXEL_EXPANSION_ICP_CORR = 1.5


@dataclasses.dataclass
class Constraint:
    """Pose-graph constraint between two submaps (``Constraints.hpp``)."""

    source_submap_idx: int
    target_submap_idx: int
    source_to_target: np.ndarray           # 4x4
    information_matrix: np.ndarray         # 6x6
    is_odometry_constraint: bool = True
    is_information_matrix_valid: bool = False
    timestamp: Optional[float] = None


def get_map_voxel_size(map_voxel_size: float) -> float:
    return VOXEL_SIZE_CORR_SEARCH_IF_ZERO if abs(map_voxel_size) <= 1e-3 else map_voxel_size


def _masked(pc: PointCloud, mask) -> PointCloud:
    return pc.with_(mask=pc.mask & mask)


from functools import lru_cache, partial as _partial  # noqa: E402

import jax  # noqa: E402


@lru_cache(maxsize=None)
def _build_constraint_fn(is_compute_overlap: bool,
                         icp_max_corr_distance: float,
                         voxel_size_overlap: float,
                         is_estimate_information_matrix: bool,
                         is_skip_icp_refinement: bool,
                         src_compact_cap: int, tgt_compact_cap: int):
    """ONE jitted program for the whole constraint estimation: overlap ->
    compact -> (optional ICP refine) -> correspondences -> information
    matrix.  The host pulls (T_icp, info) in a single transfer — in a
    congested tunnel session every extra blocking pull costs a full RTT,
    and the old 4-pull version dominated closure-heavy replay.

    Compaction rationale (uniform-stride subsample on overflow): every
    device program scales with CAPACITY and >32k/64k points gain nothing
    for a 6-DoF constraint; the information matrix is rescaled by the
    full/compacted valid-count ratio so edge weights keep the reference's
    full-cloud magnitudes (``GetInformationMatrixFromPointClouds`` sums
    over ALL source correspondences)."""
    from open3d_slam_tpu.utils import pointcloud as pclib

    @jax.jit
    def fn(source: PointCloud, target: PointCloud):
        if is_compute_overlap:
            src_m, tgt_m = overlap_ops.overlapping_masks(
                source, target, jnp.eye(4), voxel_size_overlap)
            source = _masked(source, src_m)     # noqa: F823
            target = _masked(target, tgt_m)
        n_src_full = source.count().astype(jnp.float32)
        source = pclib.compact_to(source, src_compact_cap)
        target = pclib.compact_to(target, tgt_compact_cap)
        info_scale = jnp.maximum(
            1.0, n_src_full / jnp.clip(source.count().astype(jnp.float32),
                                       1.0, None))

        T_icp = jnp.eye(4)
        if not is_skip_icp_refinement:
            grid = hashgrid.build(target, cell_size=icp_max_corr_distance)
            res = reg_ops.icp_point_to_plane(
                source, grid, jnp.eye(4), icp_max_corr_distance,
                max_iterations=ICP_RUN_UNTIL_CONVERGENCE_ITERS)
            T_icp = res.transformation

        info = jnp.eye(6)
        if is_estimate_information_matrix:
            grid = hashgrid.build(target, cell_size=icp_max_corr_distance)
            pts = se3.transform_points(T_icp, source.points)
            idx, d2, found = hashgrid.query_nearest(grid, pts,
                                                    icp_max_corr_distance)
            q = grid.points_sorted[idx]
            info = info_scale * pg_ops.information_matrix_from_correspondences(
                q, found & source.mask)
        return T_icp, info

    return fn


def finalize_constraint(c: Constraint, outputs) -> Constraint:
    """Fill a dispatched constraint's (T, info) from its device outputs
    (already host-side when prefetched)."""
    T_icp, info = jax.device_get(outputs)
    c.source_to_target = np.asarray(T_icp, np.float64)
    if c.is_information_matrix_valid:
        c.information_matrix = np.asarray(info, np.float64)
    return c


def build_constraint(source_idx: int, target_idx: int, submaps,
                     is_compute_overlap: bool,
                     icp_max_corr_distance: float,
                     voxel_size_overlap: float,
                     is_estimate_information_matrix: bool,
                     is_skip_icp_refinement: bool,
                     pending_out: Optional[list] = None) -> Constraint:
    """``buildConstraint`` (``constraint_builders.cpp:43-90``).

    With ``pending_out`` the device program is dispatched and its outputs
    prefetched but NOT pulled: ``(constraint, outputs)`` is appended for a
    later ``finalize_constraint`` (constraints are only read when an
    optimization round consumes them, scans later — no reason to
    host-block the replay loop now)."""
    source = submaps.get_submap(source_idx).map_cloud
    target = submaps.get_submap(target_idx).map_cloud
    fn = _build_constraint_fn(
        bool(is_compute_overlap), float(icp_max_corr_distance),
        float(voxel_size_overlap), bool(is_estimate_information_matrix),
        bool(is_skip_icp_refinement),
        min(source.capacity, 32768), min(target.capacity, 65536))
    outputs = fn(source, target)

    c = Constraint(
        source_submap_idx=source_idx,
        target_submap_idx=target_idx,
        source_to_target=np.eye(4),
        information_matrix=np.eye(6),
        is_odometry_constraint=True,
        is_information_matrix_valid=is_estimate_information_matrix,
    )
    if pending_out is not None:
        from open3d_slam_tpu.utils.device import prefetch_to_host
        prefetch_to_host(*outputs)
        pending_out.append((c, outputs))
        return c
    return finalize_constraint(c, outputs)


def build_odometry_constraint(source_idx: int, target_idx: int, submaps,
                              pending_out: Optional[list] = None) -> Constraint:
    """``buildOdometryConstraint`` (``constraint_builders.cpp:33-41``)."""
    p = submaps.params
    vox = get_map_voxel_size(p.map_builder.map_voxel_size)
    c = build_constraint(
        source_idx, target_idx, submaps,
        is_compute_overlap=True,
        icp_max_corr_distance=VOXEL_EXPANSION_ICP_CORR * vox,
        voxel_size_overlap=VOXEL_EXPANSION_OVERLAP * vox,
        is_estimate_information_matrix=True,
        is_skip_icp_refinement=not p.is_refine_odometry_constraints_between_submaps,
        pending_out=pending_out)
    c.is_odometry_constraint = True
    return c


def _has_constraint(source_idx, target_idx, constraints: List[Constraint]) -> bool:
    return any(c.source_submap_idx == source_idx and c.target_submap_idx == target_idx
               for c in constraints)


def compute_odometry_constraints(submaps, constraints: List[Constraint],
                                 candidates=None,
                                 pending_out: Optional[list] = None):
    """Both overloads of ``computeOdometryConstraints``
    (``constraint_builders.cpp:92-118``); appends in place.  With
    ``pending_out``, constraint programs are dispatched without pulling
    (see ``build_constraint``)."""
    if candidates is not None:
        for cand in candidates:
            if cand.submap_id < 1:
                continue
            target = cand.submap_id
            source = submaps.get_submap(target).parent_id
            if not _has_constraint(source, target, constraints):
                constraints.append(build_odometry_constraint(
                    source, target, submaps, pending_out=pending_out))
    else:
        active = submaps.get_active_submap().id
        for target in range(1, submaps.get_num_submaps()):
            source = submaps.get_submap(target).parent_id
            if (not _has_constraint(source, target, constraints)
                    and source != active and target != active):
                constraints.append(build_odometry_constraint(
                    source, target, submaps, pending_out=pending_out))
