"""Cloud format conversions.

ROS-free analog of the reference's ``open3d_conversions`` package
(``open3d_utils/open3d_conversions/src/open3d_conversions.cpp:19-95``):
``PointCloud2``-style structured numpy record arrays (fields x, y, z and
optionally rgb / intensity / normal_*) <-> the engine's padded ``PointCloud``
pytree.  Covers the colored, uncolored, and intensity variants the reference
round-trips in its conversion tests.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.utils.pointcloud import PointCloud


def structured_to_pointcloud(arr: np.ndarray,
                             capacity: Optional[int] = None) -> PointCloud:
    """Structured array with fields (x, y, z[, rgb|r,g,b|intensity,
    normal_x..]) -> padded PointCloud.  Intensity maps to a grayscale color,
    like the reference's intensity handling."""
    names = arr.dtype.names
    assert names and all(k in names for k in "xyz"), "need x, y, z fields"
    pts = np.stack([arr["x"], arr["y"], arr["z"]], axis=1).astype(np.float32)
    normals = None
    if all(f"normal_{a}" in names for a in "xyz"):
        normals = np.stack([arr["normal_x"], arr["normal_y"], arr["normal_z"]],
                           axis=1).astype(np.float32)
    colors = None
    if "rgb" in names:
        rgb = np.ascontiguousarray(arr["rgb"]).view(np.uint32).reshape(-1)
        colors = np.stack([(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF],
                          axis=1).astype(np.float32) / 255.0
    elif all(c in names for c in "rgb"):
        colors = np.stack([arr["r"], arr["g"], arr["b"]], axis=1).astype(np.float32)
        if colors.max() > 1.0:
            colors /= 255.0
    elif "intensity" in names:
        i = arr["intensity"].astype(np.float32)
        i = i / max(float(i.max()), 1e-6)
        colors = np.stack([i, i, i], axis=1)
    return pclib.from_numpy(pts, capacity=capacity, normals=normals, colors=colors)


def pointcloud_to_structured(pc: PointCloud) -> np.ndarray:
    """Padded PointCloud -> structured array of the valid points."""
    data = pclib.to_numpy(pc)
    n = data["points"].shape[0]
    fields = [("x", np.float32), ("y", np.float32), ("z", np.float32)]
    if "normals" in data:
        fields += [("normal_x", np.float32), ("normal_y", np.float32),
                   ("normal_z", np.float32)]
    if "colors" in data:
        fields += [("rgb", np.float32)]
    out = np.zeros(n, dtype=fields)
    out["x"], out["y"], out["z"] = data["points"].T
    if "normals" in data:
        out["normal_x"], out["normal_y"], out["normal_z"] = data["normals"].T
    if "colors" in data:
        c = np.clip(data["colors"] * 255.0, 0, 255).astype(np.uint32)
        rgb = (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]
        out["rgb"] = rgb.view(np.float32)
    return out


# ---------------------------------------------------------------------------
# Triangle meshes — ROS-free analog of the reference's PolygonMesh msg
# round-trip (open3d_conversions.h:76-79, open3d_conversions.cpp:260-307):
# the msg is a vertices point cloud + a list of 3-index polygons.  Here the
# wire format is a dict {"cloud": structured vertex array, "polygons":
# (T, 3) int32 index array}.


class TriangleMesh:
    """Minimal host-side triangle mesh (vertices/triangles[/colors]) — the
    engine's analog of ``open3d::geometry::TriangleMesh`` as used by the
    conversion layer."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray,
                 vertex_colors: Optional[np.ndarray] = None):
        self.vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        self.triangles = np.asarray(triangles, np.int32).reshape(-1, 3)
        self.vertex_colors = (None if vertex_colors is None else
                              np.asarray(vertex_colors, np.float32).reshape(-1, 3))


def mesh_to_polygon_msg(mesh: TriangleMesh) -> dict:
    """TriangleMesh -> PolygonMesh-style dict (``open3dToRos`` mesh path,
    ``open3d_conversions.cpp:260-286``): vertices ride the cloud conversion,
    triangles become the polygon index list."""
    cloud = pclib.from_numpy(mesh.vertices,
                             colors=mesh.vertex_colors)
    return {
        "cloud": pointcloud_to_structured(cloud),
        "polygons": mesh.triangles.copy(),
    }


def polygon_msg_to_mesh(msg: dict) -> TriangleMesh:
    """PolygonMesh-style dict -> TriangleMesh (``rosToOpen3d`` mesh path,
    ``open3d_conversions.cpp:292-307``)."""
    pc = structured_to_pointcloud(msg["cloud"])
    data = pclib.to_numpy(pc)
    tri = np.asarray(msg["polygons"], np.int32).reshape(-1, 3)
    if len(tri) and (tri.min() < 0 or tri.max() >= data["points"].shape[0]):
        raise ValueError("polygon index out of range of the vertex cloud")
    return TriangleMesh(data["points"], tri,
                        vertex_colors=data.get("colors"))
