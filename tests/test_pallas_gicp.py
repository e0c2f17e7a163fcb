"""Fused GICP kernel (ops/pallas_gicp.py): interpret-mode correctness (CPU).

Validates the fused correspondence + Mahalanobis normal-equation kernel and
the batched GN loop against the unfused composition (probe-NN query +
``_gicp_step``), which is itself validated against Open3D GICP semantics in
test_registration.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.ops import hashgrid, normals as normals_ops
from open3d_slam_tpu.ops import pallas_gicp, pallas_icp
from open3d_slam_tpu.ops import registration as reg_ops
from open3d_slam_tpu.utils import pointcloud as pclib, se3


def _scene(rng, n_tgt=512, n_src=128, offset=(0.08, -0.05, 0.02)):
    half = n_tgt // 2
    ground = np.stack([rng.uniform(-5, 5, half), rng.uniform(-5, 5, half),
                       0.01 * rng.standard_normal(half)], axis=1)
    wall = np.stack([rng.uniform(-5, 5, n_tgt - half),
                     5.0 + 0.01 * rng.standard_normal(n_tgt - half),
                     rng.uniform(0, 3, n_tgt - half)], axis=1)
    tgt = np.concatenate([ground, wall]).astype(np.float32)
    src = tgt[rng.choice(n_tgt, n_src, replace=False)] + np.asarray(offset, np.float32)
    return src, tgt


@pytest.fixture
def prepared(rng):
    src, tgt = _scene(rng)
    tgt_pc = pclib.from_numpy(tgt, capacity=512)
    tgt_pc = normals_ops.estimate_normals(tgt_pc, 0.8, max_nn=12)
    grid = hashgrid.build(tgt_pc, 0.5)
    tgt_covs = normals_ops.covariances_from_normals(tgt_pc)
    covs_sorted = tgt_covs[grid.order]
    src_pc = pclib.from_numpy(src, capacity=128)
    src_pc = normals_ops.estimate_normals(src_pc, 0.8, max_nn=12)
    src_covs = normals_ops.covariances_from_normals(src_pc)
    return src_pc, src_covs, grid, covs_sorted


def test_gicp_normal_eq_matches_unfused(prepared):
    src_pc, src_covs, grid, covs_sorted = prepared
    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    td, tv = pallas_gicp.prepare_target(grid.points_sorted, covs_sorted, valid)
    maskf = src_pc.mask.astype(jnp.float32)[:, None]
    qcov6 = pallas_gicp.cov6_from_full(src_covs)
    r2 = jnp.full((1, 1), 0.25, jnp.float32)
    # Identity pose: q_cov6 rotation is a no-op, pts are raw source points.
    out = pallas_gicp.gicp_normal_eq(
        src_pc.points[None], maskf, qcov6[None], td, tv, r2,
        block_m=64, block_n=128, interpret=True)
    JtJ, Jtr, n_in, d2s = pallas_icp.unpack(out)

    idx, d2, w = hashgrid.query_nearest(grid, src_pc.points, 0.5, method="probe")
    wm = w & src_pc.mask
    JtJ_ref, Jtr_ref = reg_ops._gicp_step(
        src_pc.points, grid.points_sorted[idx], src_covs, covs_sorted[idx], wm)
    assert int(n_in[0]) == int(jnp.sum(wm))
    np.testing.assert_allclose(np.asarray(d2s[0]),
                               float(jnp.sum(jnp.where(wm, d2, 0.0))), rtol=1e-4)
    # Kernel adds 1e-6 PD jitter to C_sum (min eig >= 2e-3), so entries agree
    # to ~5e-4 relative.
    scale = np.abs(np.asarray(JtJ_ref)).max()
    np.testing.assert_allclose(np.asarray(JtJ[0]), np.asarray(JtJ_ref),
                               rtol=5e-3, atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(Jtr[0]), np.asarray(Jtr_ref),
                               rtol=5e-3, atol=5e-3 * np.abs(np.asarray(Jtr_ref)).max())


def test_gicp_normal_eq_masks_invalid(prepared):
    src_pc, src_covs, grid, covs_sorted = prepared
    mask = np.asarray(src_pc.mask).copy()
    mask[64:] = False
    src_masked = src_pc.with_(mask=jnp.asarray(mask))
    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    td, tv = pallas_gicp.prepare_target(grid.points_sorted, covs_sorted, valid)
    maskf = src_masked.mask.astype(jnp.float32)[:, None]
    qcov6 = pallas_gicp.cov6_from_full(src_covs)
    r2 = jnp.full((1, 1), 0.25, jnp.float32)
    out = pallas_gicp.gicp_normal_eq(
        src_masked.points[None], maskf, qcov6[None], td, tv, r2,
        block_m=64, block_n=128, interpret=True)
    _, _, n_in, _ = pallas_icp.unpack(out)
    assert int(n_in[0]) <= 64


def test_fused_gicp_loop_recovers_offset(prepared):
    src_pc, src_covs, grid, covs_sorted = prepared
    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    td, tv = pallas_gicp.prepare_target(grid.points_sorted, covs_sorted, valid)
    maskf = src_pc.mask.astype(jnp.float32)[:, None]
    qcov6 = pallas_gicp.cov6_from_full(src_covs)
    n_src = jnp.sum(src_pc.mask.astype(jnp.float32))
    res = reg_ops._icp_gicp_fused_batch(
        src_pc.points[None], maskf, n_src, qcov6[None], td, tv,
        jnp.eye(4)[None], 0.5, 30, 1e-6, 1e-6, None, 64, 128, interpret=True)
    T = np.asarray(res.transformation[0])
    # The true correction moves src back onto tgt: translation ~ -offset.
    np.testing.assert_allclose(T[:3, 3], [-0.08, 0.05, -0.02], atol=0.02)
    assert float(res.fitness[0]) > 0.9

    # And it agrees with the unfused GICP solver on the same problem.
    ref = reg_ops.icp_generalized(
        src_pc, src_covs, grid, covs_sorted, jnp.eye(4), 0.5,
        max_iterations=30, nn_method="probe")
    np.testing.assert_allclose(T[:3, 3], np.asarray(ref.transformation)[:3, 3],
                               atol=0.01)


def test_rotate_cov6_roundtrip(rng):
    n = 32
    A = rng.standard_normal((n, 3, 3)).astype(np.float32)
    C = A @ np.transpose(A, (0, 2, 1)) + 0.1 * np.eye(3, dtype=np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.0, 0.0, 0.0],
                                           jnp.float32)))
    R = jnp.asarray(T[:3, :3])
    got = pallas_gicp.rotate_cov6(R, pallas_gicp.cov6_from_full(jnp.asarray(C)))
    want = pallas_gicp.cov6_from_full(
        jnp.einsum("ij,njk,lk->nil", R, jnp.asarray(C), R))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gicp_aabb_tile_skip_matches_unskipped(rng):
    """The AABB tile skip is exact: with spatially sorted targets the
    pruned kernel must produce identical normal equations."""
    src, tgt = _scene(rng)
    # Spatially sort the target (by x then y then z) to make tiles compact.
    order = np.lexsort((tgt[:, 2], tgt[:, 1], tgt[:, 0]))
    tgt = tgt[order]
    tgt_pc = pclib.from_numpy(tgt, capacity=512)
    tgt_pc = normals_ops.estimate_normals(tgt_pc, 0.8, max_nn=12)
    grid = hashgrid.HashGrid(
        hashes_sorted=jnp.where(tgt_pc.mask, 0, hashgrid.INT32_MAX),
        points_sorted=tgt_pc.points, normals_sorted=tgt_pc.normals,
        order=jnp.arange(512, dtype=jnp.int32),
        cell_size=jnp.float32(0.5))
    covs_sorted = normals_ops.covariances_from_normals(tgt_pc)
    src_pc = pclib.from_numpy(src, capacity=128)
    src_pc = normals_ops.estimate_normals(src_pc, 0.8, max_nn=12)
    src_covs = normals_ops.covariances_from_normals(src_pc)

    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    td, tv = pallas_gicp.prepare_target(grid.points_sorted, covs_sorted, valid)
    maskf = src_pc.mask.astype(jnp.float32)[:, None]
    qcov6 = pallas_gicp.cov6_from_full(src_covs)
    r2 = jnp.full((1, 1), 0.25, jnp.float32)
    aabb = pallas_gicp.tile_aabbs(grid.points_sorted, valid, 128)
    out_skip = pallas_gicp.gicp_normal_eq(
        src_pc.points[None], maskf, qcov6[None], td, tv, r2, t_aabb=aabb,
        block_m=64, block_n=128, interpret=True)
    out_full = pallas_gicp.gicp_normal_eq(
        src_pc.points[None], maskf, qcov6[None], td, tv, r2,
        block_m=64, block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)

    # And through the full fused loop.
    n_src = jnp.sum(src_pc.mask.astype(jnp.float32))
    res = reg_ops._icp_gicp_fused_batch(
        src_pc.points[None], maskf, n_src, qcov6[None], td, tv,
        jnp.eye(4)[None], 0.5, 30, 1e-6, 1e-6, None, 64, 128,
        t_aabb=aabb, interpret=True)
    np.testing.assert_allclose(np.asarray(res.transformation[0])[:3, 3],
                               [-0.08, 0.05, -0.02], atol=0.02)
