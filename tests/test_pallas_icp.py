"""Fused p2l ICP kernel (ops/pallas_icp.py): interpret-mode correctness (CPU).

Validates the fused correspondence + normal-equation kernel and the batched
GN loop built on it against the unfused composition (probe-NN query +
``_p2l_step``) that is itself validated against Open3D semantics in
test_registration.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.ops import hashgrid, normals as normals_ops, pallas_icp
from open3d_slam_tpu.ops import registration as reg_ops
from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.utils.pointcloud import PointCloud


def _scene(rng, n_tgt=512, n_src=128, offset=(0.08, -0.05, 0.02)):
    """A couple of noisy planes so normals are well-defined."""
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
    src_pc = pclib.from_numpy(src, capacity=128)
    return src_pc, grid


def test_normal_eq_matches_unfused(prepared):
    src_pc, grid = prepared
    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    t_t, tn_t, tc, tv = pallas_icp.prepare_target(
        grid.points_sorted, grid.normals_sorted, valid)
    maskf = src_pc.mask.astype(jnp.float32)[:, None]
    r2 = jnp.full((1, 1), 0.25, jnp.float32)
    out = pallas_icp.p2l_normal_eq(
        src_pc.points[None], maskf, t_t, tn_t, tc, tv, r2,
        block_m=64, block_n=128, interpret=True)
    JtJ, Jtr, n_in, d2s = pallas_icp.unpack(out)

    idx, d2, w = hashgrid.query_nearest(grid, src_pc.points, 0.5, method="probe")
    wm = w & src_pc.mask
    JtJ_ref, Jtr_ref = reg_ops._p2l_step(
        src_pc.points, grid.normals_sorted[idx], grid.points_sorted[idx], wm)
    assert int(n_in[0]) == int(jnp.sum(wm))
    np.testing.assert_allclose(np.asarray(d2s[0]),
                               float(jnp.sum(jnp.where(wm, d2, 0.0))), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(JtJ[0]), np.asarray(JtJ_ref),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Jtr[0]), np.asarray(Jtr_ref),
                               rtol=2e-3, atol=1e-3)


def test_normal_eq_masks_invalid_sources(prepared):
    src_pc, grid = prepared
    mask = np.asarray(src_pc.mask).copy()
    mask[64:] = False  # drop half the source points
    src_masked = src_pc.with_(mask=jnp.asarray(mask))
    valid = grid.hashes_sorted != hashgrid.INT32_MAX
    t_t, tn_t, tc, tv = pallas_icp.prepare_target(
        grid.points_sorted, grid.normals_sorted, valid)
    maskf = src_masked.mask.astype(jnp.float32)[:, None]
    r2 = jnp.full((1, 1), 0.25, jnp.float32)
    out = pallas_icp.p2l_normal_eq(
        src_masked.points[None], maskf, t_t, tn_t, tc, tv, r2,
        block_m=64, block_n=128, interpret=True)
    _, _, n_in, _ = pallas_icp.unpack(out)
    assert int(n_in[0]) <= 64


def test_batched_icp_matches_vmapped_probe(prepared, rng):
    src_pc, grid = prepared
    # Batch of 2 by stacking the same pair with different inits.
    def stack(x):
        return None if x is None else jnp.stack([x, x])

    srcs = PointCloud(points=stack(src_pc.points), mask=stack(src_pc.mask))
    grids = hashgrid.HashGrid(
        hashes_sorted=stack(grid.hashes_sorted),
        points_sorted=stack(grid.points_sorted),
        normals_sorted=stack(grid.normals_sorted),
        order=stack(grid.order), cell_size=stack(grid.cell_size))
    inits = jnp.stack([jnp.eye(4), jnp.eye(4)])

    fused = reg_ops.batched_icp_point_to_plane(
        srcs, grids, inits, 0.5, max_iterations=12, interpret=True)
    ref = jax.vmap(lambda s, g, T0: reg_ops.icp_point_to_plane(
        s, g, T0, 0.5, max_iterations=12, nn_method="probe"))(srcs, grids, inits)
    np.testing.assert_allclose(np.asarray(fused.transformation),
                               np.asarray(ref.transformation), atol=5e-3)
    np.testing.assert_allclose(np.asarray(fused.fitness),
                               np.asarray(ref.fitness), atol=1e-3)


def test_batched_icp_shared_target(prepared):
    """Shared-source/-target layout: only inits are batched (multi-start)."""
    src_pc, grid = prepared
    d = np.eye(4, dtype=np.float32)
    d[:3, 3] = [0.05, 0.0, 0.0]
    inits = jnp.stack([jnp.eye(4), jnp.asarray(d)])
    res = reg_ops.batched_icp_point_to_plane(
        src_pc, grid, inits, 0.5, max_iterations=12, interpret=True)
    # Both hypotheses should converge to (close to) the same registration.
    np.testing.assert_allclose(np.asarray(res.transformation[0]),
                               np.asarray(res.transformation[1]), atol=2e-2)
    assert float(res.fitness[0]) > 0.9
