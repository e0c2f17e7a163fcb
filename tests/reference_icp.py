"""NumPy reference implementations mirroring Open3D registration semantics.

Used as ground truth for the TPU solver tests (Open3D itself is not
available in this environment).  Mirrors:
  * RegistrationICP w/ TransformationEstimationPointToPlane: per-iteration
    KD-tree NN within max_dist, GN solve of n.(p-q) with J=[pxn, n], Euler
    XYZ retraction, relative fitness/rmse convergence.
  * TransformationEstimationPointToPoint: Umeyama (no scaling).
"""
import numpy as np
from scipy.spatial import cKDTree


def euler_xyz_transform(x):
    a, b, c = x[0], x[1], x[2]
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    T[:3, 3] = x[3:6]
    return T


def transform_pts(T, pts):
    return pts @ T[:3, :3].T + T[:3, 3]


def corr_and_stats(src_pts, tree, T, max_dist):
    p = transform_pts(T, src_pts)
    dist, idx = tree.query(p, k=1, distance_upper_bound=max_dist)
    found = np.isfinite(dist)
    fitness = found.mean() if len(found) else 0.0
    rmse = np.sqrt((dist[found] ** 2).mean()) if found.any() else 0.0
    return idx, found, fitness, rmse


def icp_point_to_plane(src_pts, tgt_pts, tgt_normals, init, max_dist,
                       max_iter=50, rel_fitness=1e-6, rel_rmse=1e-6):
    tree = cKDTree(tgt_pts)
    T = init.copy()
    idx, found, fitness, rmse = corr_and_stats(src_pts, tree, T, max_dist)
    iters = 0
    for _ in range(max_iter):
        p = transform_pts(T, src_pts)[found]
        q = tgt_pts[idx[found]]
        n = tgt_normals[idx[found]]
        r = np.sum(n * (p - q), axis=1)
        J = np.concatenate([np.cross(p, n), n], axis=1)
        JtJ = J.T @ J
        Jtr = J.T @ r
        delta = np.linalg.solve(JtJ + 1e-6 * np.trace(JtJ) / 6 * np.eye(6), -Jtr)
        T = euler_xyz_transform(delta) @ T
        idx, found, f_new, r_new = corr_and_stats(src_pts, tree, T, max_dist)
        iters += 1
        if abs(fitness - f_new) < rel_fitness and abs(rmse - r_new) < rel_rmse:
            fitness, rmse = f_new, r_new
            break
        fitness, rmse = f_new, r_new
    return T, fitness, rmse, iters


def umeyama(p, q):
    p_bar, q_bar = p.mean(0), q.mean(0)
    H = (p - p_bar).T @ (q - q_bar)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = q_bar - R @ p_bar
    return T


def icp_point_to_point(src_pts, tgt_pts, init, max_dist,
                       max_iter=30, rel_fitness=1e-6, rel_rmse=1e-6):
    tree = cKDTree(tgt_pts)
    T = init.copy()
    idx, found, fitness, rmse = corr_and_stats(src_pts, tree, T, max_dist)
    iters = 0
    for _ in range(max_iter):
        p = transform_pts(T, src_pts)[found]
        q = tgt_pts[idx[found]]
        T = umeyama(p, q) @ T
        idx, found, f_new, r_new = corr_and_stats(src_pts, tree, T, max_dist)
        iters += 1
        if abs(fitness - f_new) < rel_fitness and abs(rmse - r_new) < rel_rmse:
            fitness, rmse = f_new, r_new
            break
        fitness, rmse = f_new, r_new
    return T, fitness, rmse, iters


def make_surface_scan(rng, n=3000, extent=10.0):
    """Synthetic structured scene: ground plane + two walls + noise bumps.

    Surfaces (not uniform noise) so that point-to-plane ICP is well-posed.
    """
    n1 = n // 2
    n2 = n // 4
    n3 = n - n1 - n2
    ground = np.stack([
        rng.uniform(-extent, extent, n1),
        rng.uniform(-extent, extent, n1),
        0.02 * rng.standard_normal(n1)], axis=1)
    wall1 = np.stack([
        rng.uniform(-extent, extent, n2),
        extent * np.ones(n2) + 0.02 * rng.standard_normal(n2),
        rng.uniform(0, 4, n2)], axis=1)
    wall2 = np.stack([
        -extent * np.ones(n3) + 0.02 * rng.standard_normal(n3),
        rng.uniform(-extent, extent, n3),
        rng.uniform(0, 4, n3)], axis=1)
    return np.concatenate([ground, wall1, wall2]).astype(np.float32)


def plane_normals(pts, k=20):
    """PCA normals from k-NN, oriented toward origin (sensor at origin)."""
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k)
    neigh = pts[idx]
    mean = neigh.mean(1, keepdims=True)
    d = neigh - mean
    cov = np.einsum("nki,nkj->nij", d, d) / k
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    flip = np.sum(normals * (0 - pts), axis=1) < 0
    normals[flip] *= -1
    return normals.astype(np.float32)
