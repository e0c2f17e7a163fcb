import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from open3d_slam_tpu.utils import pointcloud as pclib, se3
from open3d_slam_tpu.ops import hashgrid, registration, normals as normals_ops

import reference_icp as ref


def make_pair(rng, n=2000, angle=0.04, trans=(0.3, -0.2, 0.1)):
    tgt = ref.make_surface_scan(rng, n=n)
    nrm = ref.plane_normals(tgt)
    T_gt = np.eye(4)
    T_gt[:3, :3] = Rotation.from_rotvec([0.0, 0.0, angle]).as_matrix()
    T_gt[:3, 3] = trans
    # Source = target moved by inverse ground truth; registration should
    # recover T_gt.
    src = ref.transform_pts(np.linalg.inv(T_gt), tgt)
    return src.astype(np.float32), tgt.astype(np.float32), nrm, T_gt


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_p2l_recovers_transform(rng):
    src, tgt, nrm, T_gt = make_pair(rng)
    grid = hashgrid.build(pclib.from_numpy(tgt, normals=nrm), cell_size=1.0)
    res = registration.icp_point_to_plane(
        pclib.from_numpy(src), grid, jnp.eye(4), 1.0, max_iterations=30)
    T = np.asarray(res.transformation)
    assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 0.15
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.02
    assert float(res.fitness) > 0.95
    assert float(res.inlier_rmse) < 0.06


def test_p2l_matches_numpy_reference(rng):
    """Same algorithm in NumPy/KD-tree: trajectories must agree closely."""
    src, tgt, nrm, T_gt = make_pair(rng, n=1500)
    grid = hashgrid.build(pclib.from_numpy(tgt, normals=nrm), cell_size=0.8)
    res = registration.icp_point_to_plane(
        pclib.from_numpy(src), grid, jnp.eye(4), 0.8, max_iterations=20)
    T_ref, fit_ref, rmse_ref, iters = ref.icp_point_to_plane(
        src, tgt, nrm, np.eye(4), 0.8, max_iter=20)
    T = np.asarray(res.transformation)
    assert rot_err_deg(T[:3, :3], T_ref[:3, :3]) < 0.1
    assert np.linalg.norm(T[:3, 3] - T_ref[:3, 3]) < 0.02
    assert abs(float(res.fitness) - fit_ref) < 0.02
    assert abs(float(res.inlier_rmse) - rmse_ref) < 0.01


def test_p2p_recovers_transform(rng):
    src, tgt, nrm, T_gt = make_pair(rng, n=1200, angle=0.03, trans=(0.2, 0.1, -0.05))
    grid = hashgrid.build(pclib.from_numpy(tgt), cell_size=1.0)
    res = registration.icp_point_to_point(
        pclib.from_numpy(src), grid, jnp.eye(4), 1.0, max_iterations=30)
    T = np.asarray(res.transformation)
    assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 0.3
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.05


def test_gicp_recovers_transform(rng):
    src, tgt, nrm, T_gt = make_pair(rng, n=1500)
    src_pc = pclib.from_numpy(src)
    tgt_pc = pclib.from_numpy(tgt)
    src_covs = normals_ops.estimate_covariances(src_pc, 1.0, max_nn=20)
    tgt_covs = normals_ops.estimate_covariances(tgt_pc, 1.0, max_nn=20)
    grid = hashgrid.build(tgt_pc, cell_size=1.0)
    tgt_covs_sorted = tgt_covs[grid.order]
    res = registration.icp_generalized(
        src_pc, src_covs, grid, tgt_covs_sorted, jnp.eye(4), 1.0, max_iterations=30)
    T = np.asarray(res.transformation)
    assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 0.2
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.03


def test_icp_identity_on_same_cloud(rng):
    tgt = ref.make_surface_scan(rng, n=800)
    nrm = ref.plane_normals(tgt)
    grid = hashgrid.build(pclib.from_numpy(tgt, normals=nrm), cell_size=0.5)
    res = registration.icp_point_to_plane(
        pclib.from_numpy(tgt), grid, jnp.eye(4), 0.5, max_iterations=10)
    T = np.asarray(res.transformation)
    np.testing.assert_allclose(T, np.eye(4), atol=1e-3)
    assert float(res.fitness) > 0.999
    assert float(res.inlier_rmse) < 1e-3


def test_icp_batched_vmap(rng):
    """vmap over initial poses — the localization multi-start pattern."""
    src, tgt, nrm, T_gt = make_pair(rng, n=1000)
    grid = hashgrid.build(pclib.from_numpy(tgt, normals=nrm), cell_size=1.0)
    src_pc = pclib.from_numpy(src)
    inits = jnp.stack([
        jnp.eye(4),
        jnp.asarray(se3.se3_exp(jnp.asarray([0, 0, 0.02, 0.1, 0, 0], jnp.float32))),
    ])
    batched = jax.vmap(lambda T0: registration.icp_point_to_plane(
        src_pc, grid, T0, 1.0, max_iterations=25))
    res = batched(inits)
    Ts = np.asarray(res.transformation)
    for i in range(2):
        assert rot_err_deg(Ts[i][:3, :3], T_gt[:3, :3]) < 0.3
        assert np.linalg.norm(Ts[i][:3, 3] - T_gt[:3, 3]) < 0.03


def test_evaluate_registration(rng):
    src, tgt, nrm, T_gt = make_pair(rng, n=800)
    grid = hashgrid.build(pclib.from_numpy(tgt, normals=nrm), cell_size=0.8)
    res = registration.evaluate_registration(
        pclib.from_numpy(src), grid, jnp.asarray(T_gt, jnp.float32), 0.8)
    assert float(res.fitness) > 0.99
    assert float(res.inlier_rmse) < 1e-2


def test_normals_match_reference(rng):
    pts = ref.make_surface_scan(rng, n=1000)
    pc = normals_ops.estimate_normals(pclib.from_numpy(pts), radius=1.0, max_nn=20)
    got = np.asarray(pc.normals)[: len(pts)]
    # Ground-plane points must have |n_z| ~ 1 (oriented toward origin/sensor).
    ground = np.abs(pts[:, 2]) < 0.1
    interior = (np.abs(pts[:, 0]) < 8) & (np.abs(pts[:, 1]) < 8)
    sel = ground & interior
    assert sel.sum() > 100
    nz = got[sel][:, 2]
    # Sensor at origin is above the ground plane (z=0 plane through origin);
    # orientation reference is origin so sign may vary near zero — check axis.
    assert (np.abs(nz) > 0.95).mean() > 0.95
