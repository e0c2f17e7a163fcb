"""Batched ICP registration on TPU: point-to-point, point-to-plane, and
Generalized ICP, all as Gauss-Newton loops under ``lax.while_loop``.

TPU-native replacement for the reference's ``CloudRegistration`` strategies
(``src/CloudRegistration.cpp:16-100``), which delegate to Open3D
``RegistrationICP`` / ``RegistrationGeneralizedICP``.  Matching semantics:

  * correspondences: nearest neighbor within ``max_correspondence_distance``
    (KD-tree in the reference -> 27-cell voxel-hash gather here);
  * convergence: max iterations + relative fitness/RMSE deltas, as Open3D's
    ``ICPConvergenceCriteria`` (``CloudRegistration.hpp:40,52,66``);
  * outputs: ``fitness`` (inlier fraction of source) and ``inlier_rmse``
    (RMS Euclidean correspondence distance), like ``RegistrationResult``.

The per-iteration solve reduces per-point 6-dim Jacobian contributions to a
6x6 JtJ / 6 Jtr via masked sums — the same reduction that is ``psum``-ed
across devices in the sharded multi-chip path (parallel/).

Everything vmaps over a leading batch axis: candidate poses (localization
multi-start), scan pairs (odometry batches), and submap pairs (constraint
building) all reuse this one solver.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops import hashgrid, pallas_gicp, pallas_icp
from open3d_slam_tpu.ops.hashgrid import HashGrid
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.pointcloud import PointCloud

_JITTER = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RegistrationResult:
    """Mirror of Open3D ``RegistrationResult``."""

    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray         # () inlier fraction of valid source points
    inlier_rmse: jnp.ndarray     # () RMS Euclidean distance over inliers
    num_iterations: jnp.ndarray  # () int32


def _euler_xyz_transform(x: jnp.ndarray) -> jnp.ndarray:
    """6-vector (alpha, beta, gamma, tx, ty, tz) -> 4x4 via Rz*Ry*Rx + t.

    This is Open3D's ``TransformVector6dToMatrix4d`` retraction used by its
    point-to-plane solver; we keep it for trajectory parity.
    """
    R = se3.rpy_to_matrix(x[..., 0], x[..., 1], x[..., 2])
    return se3.make_transform(R, x[..., 3:6])


def _correspondences(grid: HashGrid, pts: jnp.ndarray, source_mask: jnp.ndarray,
                     max_dist, bucket_size: int, nn_method: str = "auto"):
    idx, d2, found = hashgrid.query_nearest(grid, pts, max_dist,
                                            bucket_size=bucket_size,
                                            method=nn_method)
    w = found & source_mask
    return idx, d2, w


def _result_stats(d2: jnp.ndarray, w: jnp.ndarray, source_mask: jnp.ndarray,
                  axis_name=None):
    n_src = jnp.sum(source_mask.astype(jnp.float32))
    n_in = jnp.sum(w.astype(jnp.float32))
    d2_sum = jnp.sum(jnp.where(w, d2, 0.0))
    if axis_name is not None:
        # Point shards live on different devices: reduce the scalar stats.
        n_src = jax.lax.psum(n_src, axis_name)
        n_in = jax.lax.psum(n_in, axis_name)
        d2_sum = jax.lax.psum(d2_sum, axis_name)
    fitness = n_in / jnp.clip(n_src, 1.0, None)
    rmse = jnp.sqrt(d2_sum / jnp.clip(n_in, 1.0, None))
    return fitness, rmse


def _solve6(JtJ: jnp.ndarray, Jtr: jnp.ndarray) -> jnp.ndarray:
    """Solve the 6x6 normal equations with Tikhonov jitter (f32-safe)."""
    scale = jnp.clip(jnp.trace(JtJ) / 6.0, 1e-12, None)
    A = JtJ + (_JITTER * scale) * jnp.eye(6, dtype=JtJ.dtype)
    L, low = jax.scipy.linalg.cho_factor(A, lower=True)
    return jax.scipy.linalg.cho_solve((L, low), -Jtr)


def _p2l_step(pts, normals_t, q, w):
    """Point-to-plane GN: residual r = n_q . (p - q); J = [p x n, n]."""
    r = jnp.sum(normals_t * (pts - q), axis=-1)
    Jw = jnp.cross(pts, normals_t)
    J = jnp.concatenate([Jw, normals_t], axis=-1)          # (N, 6)
    wf = w.astype(pts.dtype)[:, None]
    Jm = J * wf
    JtJ = Jm.T @ Jm
    Jtr = Jm.T @ (r * w.astype(pts.dtype))
    return JtJ, Jtr


def _p2p_step(pts, q, w):
    """Point-to-point: weighted Kabsch (Umeyama, no scaling) like Open3D."""
    wf = w.astype(pts.dtype)[:, None]
    n = jnp.clip(jnp.sum(wf), 1.0, None)
    p_bar = jnp.sum(pts * wf, axis=0) / n
    q_bar = jnp.sum(q * wf, axis=0) / n
    P = (pts - p_bar) * wf
    Q = q - q_bar
    H = P.T @ Q                                             # (3, 3)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], pts.dtype)) + d * jnp.diag(jnp.array([0.0, 0.0, 1.0], pts.dtype))
    R = Vt.T @ D @ U.T
    t = q_bar - R @ p_bar
    return se3.make_transform(R, t)


def _gicp_step(pts, q, cov_s_t, cov_t, w, epsilon_reg=1e-10):
    """Generalized ICP GN step: r = p - q, M = (C_q + R C_p R^T)^-1."""
    M_inv = cov_t + cov_s_t                                  # (N, 3, 3) = C_q + R C_p R^T
    M = jnp.linalg.inv(M_inv + epsilon_reg * jnp.eye(3, dtype=pts.dtype))
    r = pts - q                                              # (N, 3)
    # J (3x6): d r / d xi with left-mult update: [ -hat(p) | I ].
    Jw = -se3.hat(pts)                                       # (N, 3, 3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), Jw.shape)
    J = jnp.concatenate([Jw, I], axis=-1)                    # (N, 3, 6)
    wf = w.astype(pts.dtype)[:, None, None]
    MJ = (M * wf) @ J                                        # (N, 3, 6)
    JtJ = jnp.einsum("nij,nik->jk", J, MJ)
    Jtr = jnp.einsum("nij,ni->j", MJ, r)
    return JtJ, Jtr


def _fused_blocks(m: int, n: int):
    bm = pallas_icp._pick_block(m, (256, 128, 64, 32, 16, 8))
    bn = pallas_icp._pick_block(n, (2048, 1024, 512, 256, 128))
    return bm, bn


def _icp_p2l_fused_batch(points, maskf, n_src, t_t, tn_t, tc, tv,
                         inits, max_dist, max_iterations,
                         relative_fitness, relative_rmse,
                         use_exp_retraction, axis_name,
                         block_m, block_n, interpret=False):
    """Batched p2l GN loop around the fused Pallas kernel.

    One kernel call per iteration computes correspondences + the 6x6 normal
    equations + fitness stats for the WHOLE batch; convergence is tracked
    per batch element (converged elements freeze their pose, the kernel
    simply recomputes their unchanged stats).  Semantics match the unfused
    loop: step from correspondences at T, then re-evaluate at T_new, stop on
    relative fitness/RMSE deltas (Open3D ``ICPConvergenceCriteria``).
    """
    r2 = jnp.asarray(max_dist, jnp.float32).reshape(1, 1) ** 2
    bsz = inits.shape[0]

    def stats_eq(T):
        pts = se3.transform_points(T, points)
        out = pallas_icp.p2l_normal_eq(pts, maskf, t_t, tn_t, tc, tv, r2,
                                       block_m=block_m, block_n=block_n,
                                       interpret=interpret)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        JtJ, Jtr, n_in, d2s = pallas_icp.unpack(out)
        fit = n_in / jnp.clip(n_src, 1.0, None)
        rmse = jnp.sqrt(d2s / jnp.clip(n_in, 1.0, None))
        return JtJ, Jtr, fit, rmse

    JtJ0, Jtr0, fit0, rmse0 = stats_eq(inits)
    it0 = jnp.zeros((bsz,), jnp.int32)
    done0 = jnp.zeros((bsz,), bool)

    def cond(carry):
        T, JtJ, Jtr, fit, rmse, it, itg, done = carry
        return jnp.any(~done) & (itg < max_iterations)

    def body(carry):
        T, JtJ, Jtr, fit, rmse, it, itg, done = carry
        delta = jax.vmap(_solve6)(JtJ, Jtr)
        if use_exp_retraction:
            dT = se3.se3_exp(delta)
        else:
            dT = _euler_xyz_transform(delta)
        T_new = jnp.where(done[:, None, None], T, dT @ T)
        JtJn, Jtrn, fitn, rmsen = stats_eq(T_new)
        conv = (jnp.abs(fit - fitn) < relative_fitness) & \
            (jnp.abs(rmse - rmsen) < relative_rmse)
        it = it + (~done).astype(jnp.int32)
        return T_new, JtJn, Jtrn, fitn, rmsen, it, itg + 1, done | conv

    T, _, _, fit, rmse, it, _, _ = jax.lax.while_loop(
        cond, body, (inits, JtJ0, Jtr0, fit0, rmse0, it0, jnp.int32(0), done0))
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=it)


def _icp_gicp_fused_batch(points, maskf, n_src, qcov6, td, tv,
                          inits, max_dist, max_iterations,
                          relative_fitness, relative_rmse, axis_name,
                          block_m, block_n, t_aabb=None, interpret=False):
    """Batched GICP GN loop around the fused Pallas kernel.

    Same loop semantics as ``_icp_p2l_fused_batch`` (step from stats at T,
    re-evaluate at T_new, Open3D convergence criteria, converged elements
    freeze), with the GICP ingredients: per-iteration source-covariance
    rotation ``R C_p R^T`` happens OUTSIDE the kernel (O(M) XLA einsum),
    the NN search + Mahalanobis normal equations inside.
    """
    r2 = jnp.asarray(max_dist, jnp.float32).reshape(1, 1) ** 2
    bsz = inits.shape[0]

    def stats_eq(T):
        pts = se3.transform_points(T, points)
        qc = pallas_gicp.rotate_cov6(T[..., :3, :3], qcov6)
        out = pallas_gicp.gicp_normal_eq(pts, maskf, qc, td, tv, r2,
                                         t_aabb=t_aabb,
                                         block_m=block_m, block_n=block_n,
                                         interpret=interpret)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        JtJ, Jtr, n_in, d2s = pallas_icp.unpack(out)
        fit = n_in / jnp.clip(n_src, 1.0, None)
        rmse = jnp.sqrt(d2s / jnp.clip(n_in, 1.0, None))
        return JtJ, Jtr, fit, rmse

    JtJ0, Jtr0, fit0, rmse0 = stats_eq(inits)
    it0 = jnp.zeros((bsz,), jnp.int32)
    done0 = jnp.zeros((bsz,), bool)

    def cond(carry):
        T, JtJ, Jtr, fit, rmse, it, itg, done = carry
        return jnp.any(~done) & (itg < max_iterations)

    def body(carry):
        T, JtJ, Jtr, fit, rmse, it, itg, done = carry
        delta = jax.vmap(_solve6)(JtJ, Jtr)
        dT = se3.se3_exp(delta)          # GICP uses the exp retraction
        T_new = jnp.where(done[:, None, None], T, dT @ T)
        JtJn, Jtrn, fitn, rmsen = stats_eq(T_new)
        conv = (jnp.abs(fit - fitn) < relative_fitness) & \
            (jnp.abs(rmse - rmsen) < relative_rmse)
        it = it + (~done).astype(jnp.int32)
        return T_new, JtJn, Jtrn, fitn, rmsen, it, itg + 1, done | conv

    T, _, _, fit, rmse, it, _, _ = jax.lax.while_loop(
        cond, body, (inits, JtJ0, Jtr0, fit0, rmse0, it0, jnp.int32(0), done0))
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=it)


@partial(jax.jit, static_argnames=("max_iterations", "use_exp_retraction",
                                   "interpret"))
def batched_icp_point_to_plane(source: PointCloud, target_grid: HashGrid,
                               inits: jnp.ndarray,
                               max_correspondence_distance,
                               max_iterations: int = 30,
                               relative_fitness: float = 1e-6,
                               relative_rmse: float = 1e-6,
                               use_exp_retraction: bool = False,
                               interpret: bool = False) -> RegistrationResult:
    """Natively-batched fused point-to-plane ICP (Pallas kernel).

    Two layouts, detected from array ranks:
      * per-element: ``source``/``target_grid`` leaves carry a leading batch
        dim matching ``inits`` (odometry scan-pair batches);
      * shared: ``source``/``target_grid`` are single clouds and only
        ``inits`` is batched (multi-start localization — the map is stored
        once in HBM and streamed once per kernel sweep).

    Requires a TPU backend (or ``interpret=True`` for tests); target grid
    must carry normals; capacities must tile (see ``pallas_icp.supports``).
    """
    assert target_grid.normals_sorted is not None, "target grid needs normals"
    m = source.points.shape[-2]
    n = target_grid.points_sorted.shape[-2]
    bm, bn = _fused_blocks(m, n)
    assert bm is not None and bn is not None, (m, n)
    valid = target_grid.hashes_sorted != hashgrid.INT32_MAX
    t_t, tn_t, tc, tv = pallas_icp.prepare_target(
        target_grid.points_sorted, target_grid.normals_sorted, valid)
    maskf = source.mask.astype(jnp.float32)[..., None]
    n_src = jnp.sum(source.mask.astype(jnp.float32), axis=-1)
    return _icp_p2l_fused_batch(
        source.points, maskf, n_src, t_t, tn_t, tc, tv, inits,
        max_correspondence_distance, max_iterations,
        relative_fitness, relative_rmse, use_exp_retraction, None,
        bm, bn, interpret=interpret)


@partial(jax.jit, static_argnames=("max_iterations", "bucket_size",
                                   "use_exp_retraction", "axis_name",
                                   "nn_method"))
def icp_point_to_plane(source: PointCloud, target_grid: HashGrid, init: jnp.ndarray,
                       max_correspondence_distance,
                       max_iterations: int = 50,
                       relative_fitness: float = 1e-6,
                       relative_rmse: float = 1e-6,
                       bucket_size: int = 16,
                       use_exp_retraction: bool = False,
                       axis_name=None,
                       nn_method: str = "auto") -> RegistrationResult:
    """Point-to-plane ICP of ``source`` against a prebuilt target grid.

    The target grid must carry normals (``normals_sorted``) and its cell size
    must be >= max_correspondence_distance.

    ``axis_name``: if set (inside shard_map/pjit), ``source`` is a POINT
    SHARD of a larger cloud split across that mesh axis; the per-shard 6x6
    JtJ / 6 Jtr blocks and the fitness statistics are ``psum``-reduced so
    every device runs the identical Gauss-Newton update — the multi-chip
    correspondence-block decomposition of the BASELINE north star.
    """
    assert target_grid.normals_sorted is not None, "target grid needs normals"
    if nn_method in ("auto", "fused") and jax.default_backend() == "tpu":
        bm, bn = _fused_blocks(source.capacity, target_grid.capacity)
        if bm is not None and bn is not None:
            valid = target_grid.hashes_sorted != hashgrid.INT32_MAX
            t_t, tn_t, tc, tv = pallas_icp.prepare_target(
                target_grid.points_sorted, target_grid.normals_sorted, valid)
            maskf = source.mask.astype(jnp.float32)[:, None]
            n_src = jnp.sum(source.mask.astype(jnp.float32))
            if axis_name is not None:
                n_src = jax.lax.psum(n_src, axis_name)
            res = _icp_p2l_fused_batch(
                source.points[None], maskf, n_src, t_t, tn_t, tc, tv,
                init[None], max_correspondence_distance, max_iterations,
                relative_fitness, relative_rmse, use_exp_retraction,
                axis_name, bm, bn)
            return RegistrationResult(
                transformation=res.transformation[0], fitness=res.fitness[0],
                inlier_rmse=res.inlier_rmse[0],
                num_iterations=res.num_iterations[0])
    max_dist = jnp.asarray(max_correspondence_distance, jnp.float32)

    def corr_stats(T):
        pts = se3.transform_points(T, source.points)
        idx, d2, w = _correspondences(target_grid, pts, source.mask, max_dist,
                                      bucket_size, nn_method)
        fit, rmse = _result_stats(d2, w, source.mask, axis_name)
        return pts, idx, w, fit, rmse

    pts0, idx0, w0, fit0, rmse0 = corr_stats(init)

    def cond(carry):
        T, idx, w, fit, rmse, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        T, idx, w, fit, rmse, it, _ = carry
        pts = se3.transform_points(T, source.points)
        q = target_grid.points_sorted[idx]
        n = target_grid.normals_sorted[idx]
        JtJ, Jtr = _p2l_step(pts, n, q, w)
        if axis_name is not None:
            JtJ = jax.lax.psum(JtJ, axis_name)
            Jtr = jax.lax.psum(Jtr, axis_name)
        delta = _solve6(JtJ, Jtr)
        if use_exp_retraction:
            dT = se3.se3_exp(jnp.concatenate([delta[:3], delta[3:]]))
        else:
            dT = _euler_xyz_transform(delta)
        T_new = dT @ T
        _, idx_n, w_n, fit_n, rmse_n = corr_stats(T_new)
        done = (jnp.abs(fit - fit_n) < relative_fitness) & (jnp.abs(rmse - rmse_n) < relative_rmse)
        return T_new, idx_n, w_n, fit_n, rmse_n, it + 1, done

    T, idx, w, fit, rmse, it, done = jax.lax.while_loop(
        cond, body, (init, idx0, w0, fit0, rmse0, jnp.int32(0), jnp.bool_(False)))
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=it)


@partial(jax.jit, static_argnames=("max_iterations", "bucket_size", "nn_method"))
def icp_point_to_point(source: PointCloud, target_grid: HashGrid, init: jnp.ndarray,
                       max_correspondence_distance,
                       max_iterations: int = 30,
                       relative_fitness: float = 1e-6,
                       relative_rmse: float = 1e-6,
                       bucket_size: int = 16,
                       nn_method: str = "auto") -> RegistrationResult:
    """Point-to-point ICP (Umeyama closed-form per iteration, like Open3D)."""
    max_dist = jnp.asarray(max_correspondence_distance, jnp.float32)

    def corr_stats(T):
        pts = se3.transform_points(T, source.points)
        idx, d2, w = _correspondences(target_grid, pts, source.mask, max_dist,
                                      bucket_size, nn_method)
        fit, rmse = _result_stats(d2, w, source.mask)
        return pts, idx, w, fit, rmse

    _, idx0, w0, fit0, rmse0 = corr_stats(init)

    def cond(carry):
        T, idx, w, fit, rmse, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        T, idx, w, fit, rmse, it, _ = carry
        pts = se3.transform_points(T, source.points)
        q = target_grid.points_sorted[idx]
        dT = _p2p_step(pts, q, w)
        T_new = dT @ T
        _, idx_n, w_n, fit_n, rmse_n = corr_stats(T_new)
        done = (jnp.abs(fit - fit_n) < relative_fitness) & (jnp.abs(rmse - rmse_n) < relative_rmse)
        return T_new, idx_n, w_n, fit_n, rmse_n, it + 1, done

    T, idx, w, fit, rmse, it, done = jax.lax.while_loop(
        cond, body, (init, idx0, w0, fit0, rmse0, jnp.int32(0), jnp.bool_(False)))
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=it)


@partial(jax.jit, static_argnames=("max_iterations", "bucket_size", "nn_method"))
def icp_generalized(source: PointCloud, source_covs: jnp.ndarray,
                    target_grid: HashGrid, target_covs_sorted: jnp.ndarray,
                    init: jnp.ndarray,
                    max_correspondence_distance,
                    max_iterations: int = 50,
                    relative_fitness: float = 1e-6,
                    relative_rmse: float = 1e-6,
                    bucket_size: int = 16,
                    nn_method: str = "auto") -> RegistrationResult:
    """Generalized (plane-to-plane) ICP, as ``RegistrationGeneralizedICP``
    (``CloudRegistration.cpp:16-30``).  ``target_covs_sorted`` must be in the
    grid's sorted order.

    On TPU with tileable capacities this dispatches to the fused Pallas
    kernel (``ops/pallas_gicp.py``) — the production hot path for the
    deployed default configs."""
    if nn_method in ("auto", "fused") and jax.default_backend() == "tpu":
        bm, bn = _fused_blocks(source.capacity, target_grid.capacity)
        if bm is not None and bn is not None:
            valid = target_grid.hashes_sorted != hashgrid.INT32_MAX
            td, tv = pallas_gicp.prepare_target(
                target_grid.points_sorted, target_covs_sorted, valid)
            # Per-tile AABBs for the exact tile skip: pays off because the
            # pipeline's targets arrive spatially sorted (identity-order
            # grids over packed-voxel-ordered clouds); a hash-ordered grid
            # just gets no skips, never wrong results.
            t_aabb = pallas_gicp.tile_aabbs(target_grid.points_sorted,
                                            valid, bn)
            maskf = source.mask.astype(jnp.float32)[:, None]
            qcov6 = pallas_gicp.cov6_from_full(source_covs)
            n_src = jnp.sum(source.mask.astype(jnp.float32))
            res = _icp_gicp_fused_batch(
                source.points[None], maskf, n_src, qcov6[None], td, tv,
                init[None], max_correspondence_distance, max_iterations,
                relative_fitness, relative_rmse, None, bm, bn,
                t_aabb=t_aabb)
            return RegistrationResult(
                transformation=res.transformation[0], fitness=res.fitness[0],
                inlier_rmse=res.inlier_rmse[0],
                num_iterations=res.num_iterations[0])
    max_dist = jnp.asarray(max_correspondence_distance, jnp.float32)

    def corr_stats(T):
        pts = se3.transform_points(T, source.points)
        idx, d2, w = _correspondences(target_grid, pts, source.mask, max_dist,
                                      bucket_size, nn_method)
        fit, rmse = _result_stats(d2, w, source.mask)
        return pts, idx, w, fit, rmse

    _, idx0, w0, fit0, rmse0 = corr_stats(init)

    def cond(carry):
        T, idx, w, fit, rmse, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        T, idx, w, fit, rmse, it, _ = carry
        R = T[:3, :3]
        pts = se3.transform_points(T, source.points)
        q = target_grid.points_sorted[idx]
        cov_t = target_covs_sorted[idx]
        cov_s_t = jnp.einsum("ij,njk,lk->nil", R, source_covs, R)
        JtJ, Jtr = _gicp_step(pts, q, cov_s_t, cov_t, w)
        delta = _solve6(JtJ, Jtr)
        dT = se3.se3_exp(delta)
        T_new = dT @ T
        _, idx_n, w_n, fit_n, rmse_n = corr_stats(T_new)
        done = (jnp.abs(fit - fit_n) < relative_fitness) & (jnp.abs(rmse - rmse_n) < relative_rmse)
        return T_new, idx_n, w_n, fit_n, rmse_n, it + 1, done

    T, idx, w, fit, rmse, it, done = jax.lax.while_loop(
        cond, body, (init, idx0, w0, fit0, rmse0, jnp.int32(0), jnp.bool_(False)))
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=it)


def evaluate_registration(source: PointCloud, target_grid: HashGrid,
                          T: jnp.ndarray, max_correspondence_distance,
                          bucket_size: int = 16,
                          nn_method: str = "auto") -> RegistrationResult:
    """Fitness/RMSE of a fixed transform (Open3D ``EvaluateRegistration``)."""
    pts = se3.transform_points(T, source.points)
    idx, d2, w = _correspondences(target_grid, pts, source.mask,
                                  jnp.asarray(max_correspondence_distance, jnp.float32),
                                  bucket_size, nn_method)
    fit, rmse = _result_stats(d2, w, source.mask)
    return RegistrationResult(transformation=T, fitness=fit, inlier_rmse=rmse,
                              num_iterations=jnp.int32(0))
