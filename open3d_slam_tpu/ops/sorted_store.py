"""Fused O(N) submap insertion: one multi-operand sort, no scatter.

The reference inserts a scan into its submap map-cloud through an
``std::unordered_map`` keyed by voxel and re-voxelizes the merged cloud
(``helpers.cpp:115-183``, ``Submap.cpp:39-75``).  The previous TPU port
re-voxelized with a chain of argsorts, value gathers, and log-depth
``searchsorted`` passes that cost ~150 ms/scan at the deployed 262k map
capacity.

Measured costs on TPU v5e set the design (all at 262k):
  * ``lax.sort`` with the key PLUS all value channels as operands: 2.7 ms —
    the comparator network moves the values along with the keys, so there
    is no separate argsort + per-channel gather;
  * one (C+1)-row gather of the cumulative-sum table: 4.4 ms;
  * ``searchsorted(method='scan')`` at 262k queries: 26 ms — never used.

So a full re-merge EVERY scan (~10 ms, one jitted program) is cheaper than
any incremental scheme that needs even one store-sized binary search, and
the keys are STATELESS — recomputed from the points each insert with the
pack region re-anchored at the current pose — so loop-closure transforms,
carving, and region drift need no invariant maintenance, no dirty flags,
and no rebuild path.  The shared engine is
``voxel.merge_clouds_by_voxel``; this module adds the scan-insert glue.

Semantics match the reference's re-voxelize: every row (existing map
point or scan point) weighs 1 in its voxel's mean; map points whose voxel
left the pack region (>~64 m from the CURRENT pose — beyond any scan
crop, so no scan can touch them) pass through as unmergeable singletons.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import (INT32_MAX, OUT_OF_REGION,
                                       merge_clouds_by_voxel, pack_coords,
                                       region_base_from_center, voxel_coords)
from open3d_slam_tpu.utils.pointcloud import PointCloud


def point_keys(points: jnp.ndarray, valid: jnp.ndarray, voxel_size: float,
               base: jnp.ndarray,
               mergeable: jnp.ndarray = None) -> jnp.ndarray:
    """Packed voxel keys; invalid -> INT32_MAX (dropped); out-of-region or
    not-``mergeable`` -> OUT_OF_REGION (kept verbatim as singletons —
    ``voxelizeWithinCroppingVolume``'s pass-through for points outside the
    cropping volume, ``helpers.cpp:152-158``)."""
    packed = pack_coords(voxel_coords(points, voxel_size), base)
    ok = packed >= 0
    if mergeable is not None:
        ok = ok & mergeable
    keys = jnp.where(ok, packed, jnp.int32(OUT_OF_REGION))
    return jnp.where(valid, keys, jnp.int32(INT32_MAX))


@partial(jax.jit, static_argnames=("voxel_size",))
def insert_scan_fused(map_cloud: PointCloud, scan: PointCloud,
                      T: jnp.ndarray, cropper, voxel_size: float,
                      enable: jnp.ndarray) -> PointCloud:
    """HOT PATH: transform scan to map frame, crop, merge-by-voxel with the
    existing map — one jitted program, ~10 ms at 262k map capacity.

    ``enable`` (traced bool) turns the insert into a no-op merge of zero
    scan rows (device-side gating: no host round-trip needed to skip).
    The pack region re-anchors at the current pose every call (keys are
    stateless), so region drift cannot corrupt the store.
    """
    from open3d_slam_tpu.utils import se3
    C, S = map_cloud.capacity, scan.capacity
    base = region_base_from_center(voxel_coords(T[:3, 3], voxel_size))

    spts = se3.transform_points(T, scan.points)
    snrm = (se3.rotate_vectors(T, scan.normals)
            if scan.normals is not None else None)
    valid_scan = scan.mask & enable
    inside = cropper.is_inside(spts, T[:3, 3])

    mkeys = point_keys(map_cloud.points, map_cloud.mask, voxel_size, base)
    # Scan points OUTSIDE the map-builder cropping volume are kept verbatim
    # (OUT_OF_REGION singleton), matching the reference's map content
    # (``Submap.cpp:71-74`` + ``helpers.cpp:152-158``); with the shipped
    # configs (scan crop radius == map-builder crop radius) the class is
    # empty, so the hot path keeps the cheap inexact pass-through.
    skeys = point_keys(spts, valid_scan, voxel_size, base, mergeable=inside)

    def cat(a, b):
        if a is None and b is None:
            return None
        a2 = a if a is not None else jnp.zeros((C, 3), jnp.float32)
        b2 = b if b is not None else jnp.zeros((S, 3), jnp.float32)
        return jnp.concatenate([a2, b2], axis=0)

    keys = jnp.concatenate([mkeys, skeys])
    points = jnp.concatenate([map_cloud.points, spts])
    normals = cat(map_cloud.normals, snrm)
    colors = cat(map_cloud.colors, scan.colors)
    return merge_clouds_by_voxel(keys, points, normals, colors,
                                 voxel_size, base, out_capacity=C)
