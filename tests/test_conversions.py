"""Format conversion round-trips (open3d_conversions analog)."""
import numpy as np

from open3d_slam_tpu.io import conversions
from open3d_slam_tpu.utils import pointcloud as pclib


def make_structured(n, rng, colored=False, with_normals=False, intensity=False):
    fields = [("x", np.float32), ("y", np.float32), ("z", np.float32)]
    if with_normals:
        fields += [("normal_x", np.float32), ("normal_y", np.float32),
                   ("normal_z", np.float32)]
    if colored:
        fields += [("rgb", np.float32)]
    if intensity:
        fields += [("intensity", np.float32)]
    arr = np.zeros(n, dtype=fields)
    arr["x"], arr["y"], arr["z"] = rng.normal(size=(3, n)).astype(np.float32)
    if with_normals:
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        arr["normal_x"], arr["normal_y"], arr["normal_z"] = nrm.T
    if colored:
        c = rng.integers(0, 256, size=(n, 3)).astype(np.uint32)
        arr["rgb"] = ((c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]).view(np.float32)
    if intensity:
        arr["intensity"] = rng.uniform(0, 100, n).astype(np.float32)
    return arr


def test_uncolored_roundtrip(rng):
    arr = make_structured(100, rng)
    pc = conversions.structured_to_pointcloud(arr)
    back = conversions.pointcloud_to_structured(pc)
    np.testing.assert_allclose(back["x"], arr["x"], atol=1e-6)
    np.testing.assert_allclose(back["z"], arr["z"], atol=1e-6)


def test_colored_roundtrip(rng):
    arr = make_structured(64, rng, colored=True)
    pc = conversions.structured_to_pointcloud(arr)
    assert pc.colors is not None
    back = conversions.pointcloud_to_structured(pc)
    np.testing.assert_array_equal(back["rgb"].view(np.uint32),
                                  arr["rgb"].view(np.uint32))


def test_normals_roundtrip(rng):
    arr = make_structured(64, rng, with_normals=True)
    pc = conversions.structured_to_pointcloud(arr)
    back = conversions.pointcloud_to_structured(pc)
    np.testing.assert_allclose(back["normal_x"], arr["normal_x"], atol=1e-6)


def test_intensity_becomes_grayscale(rng):
    arr = make_structured(32, rng, intensity=True)
    pc = conversions.structured_to_pointcloud(arr)
    assert pc.colors is not None
    data = pclib.to_numpy(pc)
    c = data["colors"]
    np.testing.assert_allclose(c[:, 0], c[:, 1], atol=1e-6)  # gray
    assert c.max() <= 1.0 + 1e-6


def test_submap_colors():
    from open3d_slam_tpu.utils import colors
    c0 = colors.submap_color(0)
    c12 = colors.submap_color(12)  # wraps around palette
    np.testing.assert_allclose(c0, c12)
    assert colors.PALETTE.shape[1] == 3


def test_mesh_polygon_msg_round_trip(rng):
    """TriangleMesh <-> PolygonMesh-msg round-trip (open3d_conversions.h:76-79,
    open3d_conversions.cpp:260-307)."""
    from open3d_slam_tpu.io import conversions as conv
    v = rng.normal(size=(50, 3)).astype(np.float32)
    t = rng.integers(0, 50, size=(80, 3)).astype(np.int32)
    c = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    mesh = conv.TriangleMesh(v, t, vertex_colors=c)
    msg = conv.mesh_to_polygon_msg(mesh)
    back = conv.polygon_msg_to_mesh(msg)
    np.testing.assert_allclose(back.vertices, v, atol=1e-6)
    np.testing.assert_array_equal(back.triangles, t)
    # colors ride the rgb-packed field: 8-bit quantization
    np.testing.assert_allclose(back.vertex_colors, c, atol=1.0 / 255.0 + 1e-6)


def test_mesh_polygon_msg_bad_index_rejected(rng):
    from open3d_slam_tpu.io import conversions as conv
    mesh = conv.TriangleMesh(np.zeros((4, 3), np.float32),
                             np.array([[0, 1, 2]], np.int32))
    msg = conv.mesh_to_polygon_msg(mesh)
    msg["polygons"] = np.array([[0, 1, 9]], np.int32)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        conv.polygon_msg_to_mesh(msg)
