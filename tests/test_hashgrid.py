import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.ops import hashgrid


def test_query_nearest_matches_kdtree(rng):
    target = rng.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    query = rng.uniform(-4, 4, size=(300, 3)).astype(np.float32)
    radius = 0.6
    grid = hashgrid.build(pclib.from_numpy(target), cell_size=radius)
    idx, d2, found = hashgrid.query_nearest(grid, jnp.asarray(query), radius, bucket_size=32)
    idx, d2, found = np.asarray(idx), np.asarray(d2), np.asarray(found)

    tree = cKDTree(target)
    dist_ref, idx_ref = tree.query(query, k=1, distance_upper_bound=radius)
    found_ref = np.isfinite(dist_ref)
    np.testing.assert_array_equal(found, found_ref)
    # Distances must match the KD-tree within float tolerance (the MXU
    # brute-force path may swap exactly-tied neighbors, so compare distances,
    # not indices).
    np.testing.assert_allclose(np.sqrt(d2[found]), dist_ref[found_ref], atol=1e-3)
    got_pts = np.asarray(grid.points_sorted)[idx[found]]
    ref_pts = target[idx_ref[found_ref]]
    d_each = np.linalg.norm(got_pts - query[found], axis=1)
    np.testing.assert_allclose(d_each, dist_ref[found_ref], atol=1e-3)


def test_query_nearest_respects_mask(rng):
    target = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    pc = pclib.from_numpy(target)
    mask = np.asarray(pc.mask).copy()
    mask[:50] = False  # only last 14 real points valid
    pc = pc.with_(mask=jnp.asarray(mask))
    grid = hashgrid.build(pc, cell_size=0.5)
    idx, d2, found = hashgrid.query_nearest(grid, jnp.asarray(target[:5]), 0.5, bucket_size=32)
    tree = cKDTree(target[50:64])
    dist_ref, _ = tree.query(target[:5], k=1, distance_upper_bound=0.5)
    np.testing.assert_array_equal(np.asarray(found), np.isfinite(dist_ref))


def test_query_radius_matches_kdtree(rng):
    target = rng.uniform(-2, 2, size=(400, 3)).astype(np.float32)
    query = rng.uniform(-2, 2, size=(50, 3)).astype(np.float32)
    radius = 0.5
    grid = hashgrid.build(pclib.from_numpy(target), cell_size=radius)
    idx, d2, valid = hashgrid.query_radius(grid, jnp.asarray(query), radius,
                                           bucket_size=32, max_neighbors=64)
    idx, d2, valid = np.asarray(idx), np.asarray(d2), np.asarray(valid)

    tree = cKDTree(target)
    for i in range(len(query)):
        ref = set(tree.query_ball_point(query[i], radius))
        got = set(np.asarray(grid.order)[idx[i][valid[i]]].tolist())
        assert got == ref, f"query {i}: {got} vs {ref}"


def test_query_radius_k_nearest_subset(rng):
    """When neighbors exceed max_neighbors, the K closest must be kept."""
    target = rng.uniform(-0.5, 0.5, size=(200, 3)).astype(np.float32)
    query = np.zeros((1, 3), np.float32)
    grid = hashgrid.build(pclib.from_numpy(target), cell_size=1.0)
    idx, d2, valid = hashgrid.query_radius(grid, jnp.asarray(query), 1.0,
                                           bucket_size=256, max_neighbors=10)
    idx, d2, valid = np.asarray(idx), np.asarray(d2), np.asarray(valid)
    assert valid[0].sum() == 10
    dref = np.sort(np.linalg.norm(target, axis=1))[:10]
    np.testing.assert_allclose(np.sort(np.sqrt(d2[0][valid[0]])), dref, atol=1e-5)
