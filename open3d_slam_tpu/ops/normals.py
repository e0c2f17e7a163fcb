"""Normal and covariance estimation on TPU.

Replaces Open3D's KD-tree ``EstimateNormals`` + ``NormalizeNormals`` +
``OrientNormalsTowardsCameraLocation`` (used by the reference at
``CloudRegistration.cpp:25-28,49-56`` and ``Submap.cpp:242-244``) with a
voxel-hash-grid neighborhood gather and a closed-form symmetric 3x3
eigensolver — fully batched, no per-point host loops.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops import hashgrid
from open3d_slam_tpu.utils.pointcloud import PointCloud

_EPS = 1e-12


def smallest_eigvec_sym3(C: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric 3x3 matrices.

    Analytic (trigonometric) eigenvalues + cross-product null-space
    extraction, as in Eigen's ``computeDirect`` — branch-free, vmappable.
    C: (..., 3, 3).  Returns (..., 3) unit vectors ((0,0,1) for degenerate).
    """
    # Shift by trace/3 for conditioning.
    tr = jnp.trace(C, axis1=-2, axis2=-1)
    q = tr / 3.0
    A = C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(A * A, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.clip(p2, _EPS, None))
    detB = jnp.linalg.det(A / p[..., None, None])
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues: eig1 >= eig2 >= eig3.
    eig1 = q + 2.0 * p * jnp.cos(phi)
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Null space of (C - eig3 I) via cross products of rows.
    M = C - eig3[..., None, None] * jnp.eye(3, dtype=C.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    degenerate = (vn[..., 0] < 1e-10) | (p2 < _EPS)
    v = v / jnp.clip(vn, _EPS, None)
    ez = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(degenerate[..., None], ez, v)


def _flash_blocks(n: int):
    bm = next((c for c in (256, 128, 64, 32, 16, 8) if n % c == 0), None)
    bn = next((c for c in (2048, 1024, 512, 256, 128) if n % c == 0), None)
    return bm, bn


@partial(jax.jit, static_argnames=("max_nn", "bucket_size", "method",
                                   "interpret"))
def estimate_normals(pc: PointCloud, radius, max_nn: int = 20,
                     orientation_reference: Optional[jnp.ndarray] = None,
                     bucket_size: int = 16, method: str = "auto",
                     interpret: bool = False) -> PointCloud:
    """Per-point PCA normals from radius neighborhoods.

    Mirrors Open3D ``EstimateNormals(KDTreeSearchParamHybrid(radius, max_nn))``
    + ``NormalizeNormals`` + ``OrientNormalsTowardsCameraLocation(ref)``.
    ``orientation_reference`` is the sensor position (default origin), as the
    reference passes the LiDAR position.

    ``method``: 'probe' gathers up to ``max_nn`` neighbors through the
    27-cell hash grid (fast on CPU; bucket-truncates in dense cells).
    'flash' runs the fused all-pairs Pallas moment kernel (ops/pallas_normals)
    with EXACT hybrid semantics: a k-th-NN distance prepass shrinks each
    point's radius to min(r, d_k), so the neighborhood equals Open3D's
    KDTreeSearchParamHybrid — ~100x faster than probing on TPU, where row
    gathers serialize.  'auto' picks flash on TPU when the capacity tiles.
    """
    n = pc.capacity
    if method == "auto":
        bm, bn = _flash_blocks(n)
        method = ("flash" if jax.default_backend() == "tpu"
                  and bm is not None and bn is not None else "probe")
    if method == "flash":
        from open3d_slam_tpu.ops import pallas_normals
        bm, bn = _flash_blocks(n)
        dk2 = pallas_normals.kth_neighbor_d2(pc.points, pc.mask, max_nn)
        r_pp = pallas_normals.hybrid_radius(radius, dk2)
        mom = pallas_normals.radius_moments(pc.points, pc.mask, r_pp,
                                            block_m=bm, block_n=bn,
                                            interpret=interpret)
        cnt, cov = pallas_normals.moments_to_covariance(mom)
        cnt = cnt[:, None]
        normals = smallest_eigvec_sym3(cov)
    else:
        grid = hashgrid.build(pc, cell_size=radius)
        idx, d2, valid = hashgrid.query_radius(
            grid, pc.points, radius, bucket_size=bucket_size,
            max_neighbors=max_nn)
        neigh = grid.points_sorted[idx]                   # (N, K, 3)
        w = valid.astype(jnp.float32)[..., None]          # (N, K, 1)
        cnt = jnp.sum(w, axis=1)                          # (N, 1)
        mean = jnp.sum(neigh * w, axis=1) / jnp.clip(cnt, 1.0, None)
        d = (neigh - mean[:, None, :]) * w
        cov = jnp.einsum("nki,nkj->nij", d, d) / jnp.clip(cnt[..., None], 1.0, None)
        normals = smallest_eigvec_sym3(cov)
    # Degenerate neighborhoods (fewer than 3 points) get (0, 0, 1).
    ez = jnp.zeros_like(normals).at[:, 2].set(1.0)
    normals = jnp.where(cnt < 3.0, ez, normals)
    # Orient toward the sensor.
    ref = jnp.zeros((3,), pc.points.dtype) if orientation_reference is None else orientation_reference
    to_cam = ref[None, :] - pc.points
    flip = jnp.sum(normals * to_cam, axis=-1) < 0.0
    normals = jnp.where(flip[:, None], -normals, normals)
    return pc.with_(normals=normals)


@partial(jax.jit, static_argnames=("max_nn", "bucket_size", "method",
                                   "interpret"))
def estimate_normals_at(queries: PointCloud, support: PointCloud, radius,
                        max_nn: int = 20,
                        orientation_reference: Optional[jnp.ndarray] = None,
                        bucket_size: int = 16, method: str = "auto",
                        interpret: bool = False) -> PointCloud:
    """Normals at ``queries`` from neighborhoods of a SUPPORT cloud.

    When the queries are a subset of the support (the downsample-then-
    estimate ordering of the mapper's preprocessing), the result equals
    ``estimate_normals(support)`` restricted to the query rows — at M/N of
    the kernel cost (the reference pays the full N: Open3D estimates
    normals on the whole voxelized cloud before ``RandomDownSample``,
    ``ScanToMapRegistration.cpp:35-41``; here the support stays the full
    cloud, so the PCA planes are identical)."""
    m = queries.capacity
    if method == "auto":
        bm, _ = _flash_blocks(m)
        _, bn = _flash_blocks(support.capacity)
        method = ("flash" if jax.default_backend() == "tpu"
                  and bm is not None and bn is not None else "probe")
    if method == "flash":
        from open3d_slam_tpu.ops import pallas_normals
        bm, _ = _flash_blocks(m)
        _, bn = _flash_blocks(support.capacity)
        dk2 = pallas_normals.kth_neighbor_d2_at(
            queries.points, support.points, support.mask, max_nn)
        r_pp = pallas_normals.hybrid_radius(radius, dk2)
        mom = pallas_normals.radius_moments_at(
            queries.points, support.points, support.mask, r_pp,
            block_m=bm, block_n=bn, interpret=interpret)
        cnt, cov = pallas_normals.moments_to_covariance(mom)
        cnt = cnt[:, None]
        normals = smallest_eigvec_sym3(cov)
    else:
        grid = hashgrid.build(support, cell_size=radius)
        idx, d2, valid = hashgrid.query_radius(
            grid, queries.points, radius, bucket_size=bucket_size,
            max_neighbors=max_nn)
        neigh = grid.points_sorted[idx]                   # (M, K, 3)
        w = valid.astype(jnp.float32)[..., None]          # (M, K, 1)
        cnt = jnp.sum(w, axis=1)                          # (M, 1)
        mean = jnp.sum(neigh * w, axis=1) / jnp.clip(cnt, 1.0, None)
        d = (neigh - mean[:, None, :]) * w
        cov = jnp.einsum("nki,nkj->nij", d, d) / jnp.clip(cnt[..., None], 1.0, None)
        normals = smallest_eigvec_sym3(cov)
    ez = jnp.zeros_like(normals).at[:, 2].set(1.0)
    normals = jnp.where(cnt < 3.0, ez, normals)
    ref = (jnp.zeros((3,), queries.points.dtype)
           if orientation_reference is None else orientation_reference)
    to_cam = ref[None, :] - queries.points
    flip = jnp.sum(normals * to_cam, axis=-1) < 0.0
    normals = jnp.where(flip[:, None], -normals, normals)
    return queries.with_(normals=normals)


@partial(jax.jit, static_argnames=("max_nn", "bucket_size"))
def estimate_covariances(pc: PointCloud, radius, max_nn: int = 20,
                         epsilon: float = 1e-3,
                         bucket_size: int = 16) -> jnp.ndarray:
    """Plane-regularized per-point covariances for Generalized ICP.

    Like Open3D's GICP covariances: C = R diag(eps, 1, 1) R^T with R taking
    e_x to the local surface normal — small variance along the normal.
    Returns (N, 3, 3).
    """
    with_n = estimate_normals(pc, radius, max_nn=max_nn, bucket_size=bucket_size)
    return covariances_from_normals(with_n, epsilon=epsilon)


@jax.jit
def covariances_from_normals(pc: PointCloud, epsilon: float = 1e-3) -> jnp.ndarray:
    """GICP covariances from existing normals (no neighborhood search)."""
    n = pc.normals
    # Build an orthonormal frame (n, u, v).
    a = jnp.where(jnp.abs(n[:, :1]) < 0.9,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape))
    u = jnp.cross(n, a)
    u = u / jnp.clip(jnp.linalg.norm(u, axis=-1, keepdims=True), _EPS, None)
    v = jnp.cross(n, u)
    R = jnp.stack([n, u, v], axis=-1)  # columns: n, u, v
    D = jnp.diag(jnp.array([epsilon, 1.0, 1.0], n.dtype))
    return jnp.einsum("nij,jk,nlk->nil", R, D, R)
