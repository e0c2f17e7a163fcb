"""Unit tests for croppers, motion compensation, buffers, config, dense map,
carving."""
import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils import pointcloud as pclib, se3, config as cfg
from open3d_slam_tpu.ops import croppers, motion_compensation as mc, dense_map, carving
from open3d_slam_tpu.models.buffers import TransformInterpolationBuffer
from open3d_slam_tpu.models.adjacency import AdjacencyMatrix


def test_cropper_max_radius(rng):
    pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    out = croppers.max_radius(2.0).crop(pc)
    got = pclib.to_numpy(out)["points"]
    ref = pts[np.linalg.norm(pts, axis=1) <= 2.0]
    assert got.shape[0] == ref.shape[0]


def test_cropper_min_max_at_pose(rng):
    pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    center = np.array([1.0, 1.0, 0.0], np.float32)
    pc = pclib.from_numpy(pts)
    out = croppers.min_max_radius(1.0, 3.0).crop(pc, jnp.asarray(center))
    d = np.linalg.norm(pts - center, axis=1)
    ref = pts[(d >= 1.0) & (d <= 3.0)]
    assert pclib.to_numpy(out)["points"].shape[0] == ref.shape[0]


def test_cylinder_cropper(rng):
    """Cylinder: xy radius relative to pose, ABSOLUTE z bounds
    (croppers.cpp:163-165)."""
    pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    center = np.array([0.5, -0.5, 2.0], np.float32)  # z offset must NOT shift z-test
    out = croppers.cylinder(1.5, min_z=-1.0, max_z=0.5).crop(pc, jnp.asarray(center))
    r = np.linalg.norm(pts[:, :2] - center[None, :2], axis=1)
    ref = pts[(r <= 1.5) & (pts[:, 2] >= -1.0) & (pts[:, 2] <= 0.5)]
    assert pclib.to_numpy(out)["points"].shape[0] == ref.shape[0]


def test_cropper_from_params_wiring():
    """Every cropper type constructible from ScanCroppingParameters with all
    fields wired (croppers.cpp:26-48 factory)."""
    for name in ("MaxRadius", "MinRadius", "MinMaxRadius", "Cylinder"):
        c = cfg.ScanCroppingParameters(
            cropper_name=name, cropping_min_radius=1.0, cropping_max_radius=9.0,
            cropping_min_z=-2.0, cropping_max_z=3.0)
        vol = croppers.from_cropper_params(c)
        pts = np.array([[0.5, 0, 0], [5, 0, 0], [5, 0, 4.0], [20, 0, 0]], np.float32)
        got = pclib.to_numpy(vol.crop(pclib.from_numpy(pts)))["points"]
        expected = {
            "MaxRadius": 3,      # all but the r=20 point
            "MinRadius": 3,      # all but the r=0.5 point
            "MinMaxRadius": 2,   # the two r≈5 points
            "Cylinder": 2,       # r_xy<=9 and z within [-2,3]: first two
        }[name]
        assert got.shape[0] == expected, name


def test_color_range_cropper(rng):
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts, colors=cols)
    cropper = croppers.ColorRangeCropper(
        rgb_min=jnp.asarray([0.2, 0.0, 0.0]), rgb_max=jnp.asarray([0.8, 1.0, 1.0]))
    out = pclib.to_numpy(cropper.crop(pc))
    keep = (cols[:, 0] >= 0.2) & (cols[:, 0] <= 0.8)
    assert out["points"].shape[0] == keep.sum()
    # Colorless cloud passes through (croppers.cpp:188-192).
    pc2 = pclib.from_numpy(pts)
    assert pclib.to_numpy(cropper.crop(pc2))["points"].shape[0] == 50


def test_motion_compensation_phase():
    pts = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]], np.float32))
    phase_ccw = np.asarray(mc.compute_phase(pts, is_spinning_clockwise=False))
    np.testing.assert_allclose(phase_ccw, [0.0, 0.25, 0.5, 0.75], atol=1e-6)
    phase_cw = np.asarray(mc.compute_phase(pts, is_spinning_clockwise=True))
    np.testing.assert_allclose(phase_cw, [0.0, 0.75, 0.5, 0.25], atol=1e-6)


def test_motion_compensation_undistort(rng):
    pts = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    v = jnp.asarray([1.0, 0.0, 0.0])
    w = jnp.zeros(3)
    out = mc.undistort_constant_velocity(pc, v, w, 0.1, is_spinning_clockwise=False)
    phase = np.asarray(mc.compute_phase(pc.points, False))
    expected = np.asarray(pc.points) + phase[:, None] * 0.1 * np.array([1.0, 0, 0])
    np.testing.assert_allclose(np.asarray(out.points), expected, atol=1e-5)


def test_transform_interpolation_buffer():
    buf = TransformInterpolationBuffer(size_limit=100)
    T0, T1 = np.eye(4), np.eye(4)
    T1[:3, 3] = [2, 0, 0]
    buf.push(0.0, T0)
    buf.push(1.0, T1)
    assert buf.has(0.5)
    Ti = buf.lookup(0.5)
    np.testing.assert_allclose(Ti[:3, 3], [1, 0, 0], atol=1e-5)
    # out-of-order push rejected
    assert not buf.push(0.5, T0)
    # clamped lookup
    np.testing.assert_allclose(buf.lookup_clamped(5.0), T1, atol=1e-6)
    np.testing.assert_allclose(buf.lookup_clamped(-5.0), T0, atol=1e-6)


def test_buffer_size_limit():
    buf = TransformInterpolationBuffer(size_limit=3)
    for i in range(10):
        buf.push(float(i), np.eye(4))
    assert len(buf) == 3
    assert buf.earliest_time() == 7.0


def test_adjacency_bfs():
    a = AdjacencyMatrix()
    a.add_edge(0, 1); a.add_edge(1, 2); a.add_edge(2, 3)
    a.mark_as_loop_closure_submap(3)
    assert a.get_distance_to_nearest_loop_closure_submap(0) == 3
    assert a.get_distance_to_nearest_loop_closure_submap(3) == 0
    assert a.is_adjacent(0, 1) and not a.is_adjacent(0, 2)


def test_config_overrides_and_linting():
    p = cfg.load_parameters({"mapper": {"scan_matcher": {"min_refinement_fitness": 0.5},
                                        "submaps": {"radius": 30.0}}})
    assert p.mapper.scan_matcher.min_refinement_fitness == 0.5
    assert p.mapper.submaps.radius == 30.0
    assert p.odometry.scan_matcher.icp.max_num_iter == 50  # default preserved
    import pytest
    with pytest.raises(cfg.ConfigError, match="unknown parameter"):
        cfg.load_parameters({"mapper": {"not_a_real_key": 1}})


def test_config_file_layering(tmp_path):
    base = tmp_path / "default.yaml"
    base.write_text("mapper:\n  submaps:\n    radius: 25.0\n")
    override = tmp_path / "sensor.yaml"
    override.write_text("include: default.yaml\nodometry:\n  scan_matcher:\n    reg_type: GeneralizedIcp\n")
    p = cfg.load_parameters_from_file(str(override))
    assert p.mapper.submaps.radius == 25.0
    assert p.odometry.scan_matcher.reg_type == "GeneralizedIcp"


def test_dense_map_insert_and_query(rng):
    vm = dense_map.empty(1024, 0.5)
    pts = rng.uniform(-2, 2, size=(200, 3)).astype(np.float32)
    pc = pclib.from_numpy(pts)
    vm = dense_map.insert(vm, pc)
    n1 = int(vm.num_voxels())
    # Inserting the same cloud again must not create new voxels.
    vm2 = dense_map.insert(vm, pc)
    assert int(vm2.num_voxels()) == n1
    out = pclib.to_numpy(dense_map.to_point_cloud(vm2))["points"]
    assert out.shape[0] == n1
    # Means stay inside their voxel.
    coords = np.floor(out / 0.5)
    assert np.all(coords * 0.5 <= out + 1e-5) and np.all(out <= (coords + 1) * 0.5 + 1e-5)


def test_dense_map_remove_keys(rng):
    vm = dense_map.empty(256, 1.0)
    pts = np.array([[0.5, 0.5, 0.5], [5.5, 5.5, 5.5]], np.float32)
    vm = dense_map.insert(vm, pclib.from_numpy(pts))
    from open3d_slam_tpu.ops.voxel import pack_coords, voxel_coords, region_base_from_center
    base = region_base_from_center(jnp.zeros(3, jnp.int32))
    key = pack_coords(voxel_coords(jnp.asarray([[0.5, 0.5, 0.5]]), 1.0), base)
    vm = dense_map.remove_keys(vm, jnp.sort(key), base)
    assert int(vm.num_voxels()) == 1
    out = pclib.to_numpy(dense_map.to_point_cloud(vm))["points"]
    np.testing.assert_allclose(out, [[5.5, 5.5, 5.5]], atol=1e-5)


def test_dense_map_hash_collision_not_merged():
    """Exact-key regression for the STORE (not just carving): two points in
    voxels whose coords differ by (-152, -951, -211) collide in the additive
    int32 hash; a hash-keyed store would merge them into one bogus blended
    mean.  With exact packed keys they must aggregate into TWO voxels."""
    vm = dense_map.empty(64, 1.0)
    a = np.array([5.5, 0.5, 0.5], np.float32)
    b = a + np.array([-152, -951, -211], np.float32)  # colliding voxel
    vm = dense_map.insert(vm, pclib.from_numpy(np.stack([a, b])))
    assert int(vm.num_voxels()) == 2
    out = pclib.to_numpy(dense_map.to_point_cloud(vm))["points"]
    got = sorted(map(tuple, np.round(out, 3)))
    want = sorted(map(tuple, np.round(np.stack([a, b]), 3)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dense_map_drops_out_of_region_points():
    """Points beyond the exact-pack region of the anchored base are dropped
    (documented behavior), never silently merged."""
    vm = dense_map.empty(64, 1.0)
    vm = dense_map.insert(vm, pclib.from_numpy(
        np.array([[0.5, 0.5, 0.5]], np.float32)))
    far = np.array([[5000.0, 0.5, 0.5]], np.float32)   # outside 1290-voxel region
    vm = dense_map.insert(vm, pclib.from_numpy(far))
    assert int(vm.num_voxels()) == 1


def test_carving_hash_collision_not_carved():
    """Exact-key regression: voxel coords differing by (-152, -951, -211)
    collide in the old additive int32 hash (73856093*dx + 19349669*dy +
    83492791*dz == 0 mod 2^32), which used to carve a valid far-away map
    point.  With exact packed keys it must be kept."""
    from open3d_slam_tpu.ops.voxel import hash_coords
    d = np.array([-152, -951, -211], np.int64)
    h = (73856093 * d[0] + 19349669 * d[1] + 83492791 * d[2]) % (2**32)
    assert h == 0  # the collision really exists in the hash family
    # Ray along +x visits voxels (0..9, 0, 0) at voxel size 1; the collider
    # voxel (5,0,0) + delta hash-collides with visited voxel (5,0,0).
    scan = np.array([[10.0, 0.0, 0.0]], np.float32)
    collider_voxel = np.array([5, 0, 0]) + np.array([-152, -951, -211])
    map_pts = np.array([collider_voxel + 0.5], np.float32)  # voxel center
    normals = np.array([[1.0, 0.0, 0.0]], np.float32)
    keep = carving.carve_mask(
        pclib.from_numpy(map_pts, normals=normals), pclib.from_numpy(scan),
        jnp.zeros(3), 1.0, 0.2, 20.0, 0.5, max_steps=32)
    assert np.asarray(keep)[0], "hash-colliding distant point must survive carving"


def test_carving_removes_freespace_points(rng):
    # Map has a stale point halfway along a ray to a scan point; carving must
    # remove it but keep the surface point (within truncation distance).
    scan = np.array([[10.0, 0.0, 0.0]], np.float32)
    map_pts = np.array([
        [5.0, 0.0, 0.0],    # free space -> carved
        [9.95, 0.0, 0.0],   # within truncation of the hit -> kept
        [0.0, 5.0, 0.0],    # off-ray -> kept
    ], np.float32)
    normals = np.tile(np.array([[1.0, 0, 0]], np.float32), (3, 1))
    map_pc = pclib.from_numpy(map_pts, normals=normals)
    scan_pc = pclib.from_numpy(scan)
    keep = carving.carve_mask(map_pc, scan_pc, jnp.zeros(3),
                              0.1, 0.2, 20.0, 0.5, max_steps=210)
    keep = np.asarray(keep)[:3]
    assert not keep[0]
    assert keep[1]
    assert keep[2]


def test_carving_normal_gate(rng):
    # Perpendicular normal (grazing) must survive carving.
    scan = np.array([[10.0, 0.0, 0.0]], np.float32)
    map_pts = np.array([[5.0, 0.0, 0.0]], np.float32)
    normals = np.array([[0.0, 1.0, 0.0]], np.float32)  # perpendicular to ray
    keep = carving.carve_mask(
        pclib.from_numpy(map_pts, normals=normals), pclib.from_numpy(scan),
        jnp.zeros(3), 0.1, 0.2, 20.0, 0.5, max_steps=210)
    assert np.asarray(keep)[0]
