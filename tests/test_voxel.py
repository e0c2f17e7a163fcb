import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.ops import voxel


def np_voxel_downsample(points, voxel_size):
    """NumPy reference: mean position per voxel (Open3D VoxelDownSample semantics)."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    key = coords[:, 0] * 10_000_019 + coords[:, 1] * 7919 + coords[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inv, points)
    np.add.at(cnt, inv, 1)
    return out / cnt[:, None]


def sorted_rows(a):
    return a[np.lexsort(a.T)]


def test_voxel_downsample_matches_numpy(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    out = voxel.voxel_downsample(pc, 0.7)
    got = pclib.to_numpy(out)["points"]
    ref = np_voxel_downsample(pts.astype(np.float64), 0.7)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(ref), atol=1e-4)


def test_voxel_downsample_averages_normals(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], np.float32)
    nrm = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    pc = pclib.from_numpy(pts, normals=nrm)
    out = pclib.to_numpy(voxel.voxel_downsample(pc, 1.0))
    assert out["points"].shape[0] == 2
    # Merged normal of first voxel is normalize([0.5, 0.5, 0]).
    merged = out["normals"][np.argmin(out["points"][:, 0])]
    np.testing.assert_allclose(merged, [np.sqrt(0.5), np.sqrt(0.5), 0.0], atol=1e-5)


def test_voxel_downsample_respects_mask(rng):
    pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    # Invalidate half the points; result should equal downsampling the kept half.
    mask = np.asarray(pc.mask).copy()
    mask[:32] = False
    pc_masked = pc.with_(mask=jnp.asarray(mask))
    got = pclib.to_numpy(voxel.voxel_downsample(pc_masked, 0.5))["points"]
    ref = np_voxel_downsample(pts[32:64].astype(np.float64), 0.5)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(ref), atol=1e-4)


def test_remove_duplicates(rng):
    pts = np.array([[0.1, 0, 0], [0.15, 0, 0], [1.9, 1.9, 1.9], [3, 3, 3]], np.float32)
    pc = pclib.from_numpy(pts)
    out = voxel.remove_duplicate_points_in_voxels(pc, 1.0)
    assert int(out.count()) == 3  # first two share voxel (0,0,0)


def test_random_downsample(rng):
    pts = rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    out = voxel.random_downsample(pc, 40, jax.random.PRNGKey(0))
    assert int(out.count()) == 40
    # Deterministic given the key.
    out2 = voxel.random_downsample(pc, 40, jax.random.PRNGKey(0))
    assert np.array_equal(np.asarray(out.mask), np.asarray(out2.mask))


def test_voxelize_within_volume(rng):
    # Points inside radius 1 of origin get voxelized; outside pass through.
    inside_pts = rng.uniform(0.1, 0.4, size=(50, 3)).astype(np.float32)
    outside_pts = (rng.uniform(2, 3, size=(20, 3))).astype(np.float32)
    pts = np.concatenate([inside_pts, outside_pts])
    pc = pclib.from_numpy(pts)
    inside = jnp.asarray(np.linalg.norm(np.asarray(pc.points), axis=1) < 1.0) & pc.mask
    out = voxel.voxelize_within_cropping_volume(pc, 1.0, inside, out_capacity=128)
    res = pclib.to_numpy(out)["points"]
    # All 50 inside points merge to one voxel-mean + 20 pass-through.
    assert res.shape[0] == 1 + 20
    outs = sorted_rows(res[np.linalg.norm(res, axis=1) > 1.0])
    np.testing.assert_allclose(outs, sorted_rows(outside_pts), atol=1e-6)


def test_concat_and_compact(rng):
    a = pclib.from_numpy(rng.normal(size=(10, 3)).astype(np.float32), capacity=16)
    b = pclib.from_numpy(rng.normal(size=(7, 3)).astype(np.float32), capacity=8)
    c = pclib.concat(a, b, capacity=32)
    assert int(c.count()) == 17
    got = pclib.to_numpy(c)["points"]
    ref = np.concatenate([pclib.to_numpy(a)["points"], pclib.to_numpy(b)["points"]])
    np.testing.assert_allclose(sorted_rows(got), sorted_rows(ref), atol=1e-6)
