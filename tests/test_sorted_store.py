"""Differential tests: fused sort-merge submap insert vs full re-voxelize.

The fused insert (ops/sorted_store.py) must produce the same map as the
reference semantics — re-voxelizing the merged (map + scan) cloud every
scan (``helpers.cpp:115-183``): same voxel count, same per-voxel means.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.ops import croppers, sorted_store, voxel
from open3d_slam_tpu.ops.sorted_store import INT32_MAX, OUT_OF_REGION
from open3d_slam_tpu.ops.voxel import region_base_from_center, voxel_coords
from open3d_slam_tpu.utils import pointcloud as pclib

VS = 0.25


def _all_inside():
    """Permissive cropper (registered pytree, safe to pass into jit)."""
    return croppers.CroppingVolume()


def _mk_cloud(rng, n, cap, lo=-5.0, hi=5.0, offset=(0.0, 0.0, 0.0)):
    pts = (rng.uniform(lo, hi, (n, 3)) + np.asarray(offset)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pclib.from_numpy(pts, capacity=cap, normals=nrm)


def _voxel_means(cloud, vs=VS):
    """dict voxel-coord -> mean point over valid points (numpy brute force)."""
    data = pclib.to_numpy(cloud)
    out = {}
    for p in data["points"]:
        c = tuple(np.floor(p / vs).astype(np.int64))
        if c in out:
            s, n = out[c]
            out[c] = (s + p, n + 1)
        else:
            out[c] = (p.astype(np.float64), 1)
    return {c: s / n for c, (s, n) in out.items()}


def test_merge_matches_bruteforce_means(rng):
    pc = _mk_cloud(rng, 600, 1024)
    base = region_base_from_center(jnp.zeros(3, jnp.int32))
    keys = sorted_store.point_keys(pc.points, pc.mask, VS, base)
    out = sorted_store.merge_clouds_by_voxel(
        keys, pc.points, pc.normals, None, VS, base, out_capacity=1024)
    want = _voxel_means(pc)
    got = _voxel_means(out)
    assert set(got) == set(want)
    for c in want:
        np.testing.assert_allclose(got[c], want[c], atol=1e-4)
    # fused-merge means are guaranteed inside their voxel
    data = pclib.to_numpy(out)
    coords = np.floor(data["points"] / VS).astype(np.int64)
    assert {tuple(c) for c in coords} == set(want)


def test_fused_insert_matches_full_revoxelize(rng):
    """K scans inserted via the fused program == re-voxelizing the growing
    concatenated cloud (the reference's insertScan semantics)."""
    cap = 4096
    T = jnp.eye(4)
    en = jnp.asarray(True)

    store = pclib.empty(cap, with_normals=True)
    ref_cloud = pclib.empty(cap, with_normals=True)

    for k in range(5):
        scan = _mk_cloud(rng, 600, 1024, lo=-4.0 + 0.5 * k, hi=4.0 + 0.5 * k)
        store = sorted_store.insert_scan_fused(
            store, scan, T, _all_inside(), VS, en)
        merged = pclib.concat(ref_cloud, scan, capacity=cap + 1024)
        ref_cloud = voxel.voxelize_within_cropping_volume(
            merged, VS, merged.mask, out_capacity=cap)

        # Compare as point sets (nearest-neighbor), not bucket keys: the
        # two paths may bucket a mean that float-rounds exactly onto a
        # voxel boundary differently; positions must agree to tolerance.
        got = np.stack(list(_voxel_means(store).values()))
        want = np.stack(list(_voxel_means(ref_cloud).values()))
        assert got.shape == want.shape, f"voxel counts diverged at scan {k}"
        d = np.linalg.norm(got[:, None, :] - want[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 1e-3, f"means diverged at scan {k}"
        assert d.min(axis=0).max() < 1e-3, f"means diverged at scan {k}"


def test_disabled_insert_keeps_map(rng):
    cap = 1024
    seed = _mk_cloud(rng, 300, cap)
    store = voxel.voxel_downsample(seed, VS, out_capacity=cap)
    scan = _mk_cloud(rng, 100, 256)
    out = sorted_store.insert_scan_fused(
        store, scan, jnp.eye(4), _all_inside(), VS, jnp.asarray(False))
    want = _voxel_means(store)
    got = _voxel_means(out)
    assert set(got) == set(want)
    for c in want:
        np.testing.assert_allclose(got[c], want[c], atol=1e-4)


def test_far_from_origin_precision(rng):
    """Float32 cumsum of absolute coords at 5 km offset would lose ~mm-cm;
    the voxel-local residual formulation must stay exact to <0.1 mm."""
    cap = 2048
    off = (5000.0, -3000.0, 200.0)
    pc = _mk_cloud(rng, 1500, cap, offset=off)
    # pose at the offset so the pack region covers the points; the scan is
    # given in the map frame already, so rotate/translate must be identity
    # in the transform sense — anchor via a translation-only pose and
    # pre-untranslate the scan.
    T = jnp.eye(4).at[:3, 3].set(jnp.asarray(off, jnp.float32))
    local = pc.with_(points=pc.points - jnp.asarray(off, jnp.float32))
    store = sorted_store.insert_scan_fused(
        pclib.empty(cap, with_normals=True), local, T, _all_inside(),
        VS, jnp.asarray(True))
    # brute force in float64
    want = _voxel_means(pc)
    got = _voxel_means(store)
    assert set(got) == set(want)
    err = max(np.linalg.norm(got[c] - want[c]) for c in want)
    # float32 ULP at 5 km is ~0.5 mm — that representation floor is the
    # only error allowed; an absolute-coordinate cumsum would be ~metres.
    assert err < 1e-3, f"far-from-origin mean error {err}"


def test_out_of_region_map_points_kept_as_singletons(rng):
    cap = 64
    # two map points in the same far-away voxel (out of the pack region
    # anchored at the origin pose) must BOTH survive unmerged.
    pts = np.array([[900.0, 900.0, 900.0],
                    [900.01, 900.01, 900.01],
                    [0.1, 0.1, 0.1]], np.float32)
    store = pclib.from_numpy(pts, capacity=cap)
    empty_scan = pclib.empty(8)
    out = sorted_store.insert_scan_fused(
        store, empty_scan, jnp.eye(4), _all_inside(), VS, jnp.asarray(True))
    got = pclib.to_numpy(out)["points"]
    assert got.shape[0] == 3
    np.testing.assert_allclose(np.sort(got[:, 0]),
                               np.sort(pts[:, 0]), atol=1e-3)


def test_overflow_keeps_uniform_stride(rng):
    cap = 64
    # 200 distinct voxels into a 64-slot store: a uniform stride of voxels
    # survives (spatially unbiased), not a one-sided prefix.
    pts = (np.arange(200)[:, None] * np.array([VS, 0, 0])).astype(np.float32) \
        + np.float32(VS / 2)
    scan = pclib.from_numpy(pts, capacity=256)
    out = sorted_store.insert_scan_fused(
        pclib.empty(cap), scan, jnp.eye(4), _all_inside(), VS,
        jnp.asarray(True))
    assert int(out.count()) == cap
    got = np.sort(pclib.to_numpy(out)["points"][:, 0])
    want = pts[(np.arange(cap) * 200 // cap), 0]
    np.testing.assert_allclose(got, want, atol=1e-4)
    # both spatial ends survive
    assert got[0] < 1.0 and got[-1] > 45.0


def test_cropper_limits_scan_not_map(rng):
    """Points outside the map-builder cropping volume — scan AND existing
    map — pass through verbatim; only in-volume points are voxel-averaged
    (``voxelizeWithinCroppingVolume`` pass-through, ``helpers.cpp:152-158``
    via ``Submap.cpp:71-74``)."""
    cap = 256
    far_map = pclib.from_numpy(
        np.array([[40.0, 0.0, 0.0]], np.float32), capacity=cap)
    scan = pclib.from_numpy(
        np.array([[1.0, 0.0, 0.0], [35.0, 0.0, 0.0]], np.float32),
        capacity=8)
    cropper = croppers.CroppingVolume(max_radius=jnp.float32(30.0))
    out = sorted_store.insert_scan_fused(
        far_map, scan, jnp.eye(4), cropper, VS, jnp.asarray(True))
    got = np.sort(pclib.to_numpy(out)["points"][:, 0])
    np.testing.assert_allclose(got, [1.0 + VS / 2 - 0.125, 35.0, 40.0],
                               atol=0.2)
    assert int(out.count()) == 3


def test_dense_map_far_from_origin_precision(rng):
    """Dense-map store aggregates voxel-center-relative residual sums: at a
    5 km offset the reconstructed means must stay at the float32
    representation floor (an absolute-position running sum would lose
    centimetres-to-decimetres to cumsum cancellation)."""
    from open3d_slam_tpu.ops import dense_map
    off = np.asarray([5000.0, -3000.0, 200.0], np.float32)
    pts = (rng.uniform(-4, 4, (1500, 3)) + off).astype(np.float32)
    pc = pclib.from_numpy(pts, capacity=2048)
    vm = dense_map.empty(4096, VS)
    vm = dense_map.insert(vm, pc)
    out = pclib.to_numpy(dense_map.to_point_cloud(vm))["points"]
    want = _voxel_means(pc)
    got = {tuple(np.floor(p / VS).astype(np.int64)): p for p in out}
    assert set(got) == set(want)
    err = max(np.linalg.norm(got[c] - want[c]) for c in want)
    assert err < 1.5e-3, f"dense far-from-origin mean error {err}"
