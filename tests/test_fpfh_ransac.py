"""FPFH + RANSAC global registration tests."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from open3d_slam_tpu.ops import fpfh as fpfh_ops, ransac, normals as normals_ops, voxel
from open3d_slam_tpu.utils import pointcloud as pclib

import reference_icp as ref


def make_scene(rng, n=2500):
    """Structured scene with distinctive geometry (ground + walls + boxes) —
    flat-ground-only scenes are FPFH-ambiguous by construction."""
    pts = ref.make_surface_scan(rng, n=n, extent=8.0)
    boxes = []
    for _ in range(6):
        cx, cy = rng.uniform(-6, 6, 2)
        w, h = rng.uniform(0.4, 1.2), rng.uniform(1.0, 3.0)
        m = n // 12
        face = rng.integers(0, 4, m)
        fx = np.where(face == 0, -w, np.where(face == 1, w, rng.uniform(-w, w, m)))
        fy = np.where(face == 2, -w, np.where(face == 3, w, rng.uniform(-w, w, m)))
        boxes.append(np.stack([cx + fx, cy + fy, rng.uniform(0, h, m)], axis=1))
    return np.concatenate([pts] + boxes).astype(np.float32)


def featurize(pts, voxel_size=0.5, radius=2.5):
    pc = pclib.from_numpy(pts)
    down = voxel.voxel_downsample(pc, voxel_size, out_capacity=2048)
    down = normals_ops.estimate_normals(down, radius=1.0, max_nn=15)
    feats = fpfh_ops.compute_fpfh(down, radius, max_nn=48)
    return down, feats


def test_fpfh_shapes_and_validity(rng):
    pts = make_scene(rng)
    down, feats = featurize(pts)
    feats = np.asarray(feats)
    mask = np.asarray(down.mask)
    assert feats.shape[1] == 33
    # Valid points have nonzero histograms; invalid rows all-zero.
    assert np.abs(feats[mask]).sum(axis=1).min() > 0
    assert np.abs(feats[~mask]).sum() == 0
    assert np.isfinite(feats).all()


def test_fpfh_invariance_to_rigid_motion(rng):
    """FPFH is built from relative geometry: rotating the cloud must keep
    each point's descriptor (approximately, up to neighborhood changes)."""
    pts = make_scene(rng, n=1500)
    R = Rotation.from_euler("z", 0.7).as_matrix().astype(np.float32)
    t = np.array([3.0, -2.0, 0.5], np.float32)
    pts_rot = pts @ R.T + t

    down_a, feat_a = featurize(pts)
    down_b, feat_b = featurize(pts_rot)
    fa, fb = np.asarray(feat_a), np.asarray(feat_b)
    ma, mb = np.asarray(down_a.mask), np.asarray(down_b.mask)
    pa = np.asarray(down_a.points)[ma]
    pb = np.asarray(down_b.points)[mb]
    fa, fb = fa[ma], fb[mb]
    # Match voxel centers across the transform; voxel grids differ after the
    # motion so compare nearest downsampled points.
    pa_in_b = pa @ R.T + t
    from scipy.spatial import cKDTree
    d, j = cKDTree(pb).query(pa_in_b, k=1)
    close = d < 0.25
    assert close.sum() > 50
    # Cosine similarity of matched descriptors is high on average.
    a = fa[close]
    b = fb[j[close]]
    cos = np.sum(a * b, axis=1) / np.clip(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-9, None)
    assert np.median(cos) > 0.9, f"median cos {np.median(cos)}"


def test_ransac_recovers_large_transform(rng):
    """RANSAC must align two views separated by a large SE(3) motion where
    ICP alone would fail (no good initial guess)."""
    pts = make_scene(rng, n=3000)
    T_gt = np.eye(4)
    T_gt[:3, :3] = Rotation.from_euler("z", 1.2).as_matrix()
    T_gt[:3, 3] = [4.0, -3.0, 0.2]
    src_pts = ref.transform_pts(np.linalg.inv(T_gt), pts).astype(np.float32)

    src, src_feat = featurize(src_pts)
    tgt, tgt_feat = featurize(pts)
    res = ransac.ransac_feature_registration(
        src, src_feat, tgt, tgt_feat,
        max_correspondence_distance=0.75,
        edge_length_similarity=0.9,
        num_hypotheses=2048,
        mutual_filter=True,
        key=jax.random.PRNGKey(3))
    T = np.asarray(res.transformation)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
    assert rot_err < 5.0, f"rot err {rot_err} deg"
    assert t_err < 0.5, f"trans err {t_err} m"
    assert int(res.num_inliers) > 25


def test_ransac_low_inliers_on_unrelated_scenes(rng):
    """Two unrelated scenes must produce a low inlier count (gate signal)."""
    pts_a = make_scene(rng, n=2000)
    rng2 = np.random.default_rng(77)
    pts_b = ref.make_surface_scan(rng2, n=2000, extent=5.0) + np.array([50.0, 0, 0])
    src, src_feat = featurize(pts_a)
    tgt, tgt_feat = featurize(pts_b)
    res = ransac.ransac_feature_registration(
        src, src_feat, tgt, tgt_feat,
        max_correspondence_distance=0.75,
        num_hypotheses=1024, key=jax.random.PRNGKey(0))
    res_fit = float(res.fitness)
    assert res_fit < 0.5, f"unrelated scenes matched with fitness {res_fit}"
