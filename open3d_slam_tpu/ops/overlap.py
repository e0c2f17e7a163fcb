"""Voxel-grid overlap masks between two clouds.

Mirror of ``computeIndicesOfOverlappingPoints`` (``helpers.cpp:307-332``):
points of source (transformed by source->target) and target that share an
occupied voxel (>= 1 point from each side) are selected.  Returns boolean
masks instead of index vectors (static shapes).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import hash_coords, voxel_coords
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max


def _member(sorted_keys: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    pos = jnp.clip(jnp.searchsorted(sorted_keys, query, side="left"),
                   0, sorted_keys.shape[0] - 1)
    return sorted_keys[pos] == query


@jax.jit
def overlapping_masks(source: PointCloud, target: PointCloud,
                      source_to_target: jnp.ndarray,
                      voxel_size) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(source_mask, target_mask) of points in mutually occupied voxels."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    src_pts = se3.transform_points(source_to_target, source.points)
    src_keys = jnp.where(source.mask,
                         hash_coords(voxel_coords(src_pts, vs)), INT32_MAX)
    tgt_keys = jnp.where(target.mask,
                         hash_coords(voxel_coords(target.points, vs)), INT32_MAX)
    src_sorted = jnp.sort(src_keys)
    tgt_sorted = jnp.sort(tgt_keys)
    src_in = _member(tgt_sorted, src_keys) & source.mask
    tgt_in = _member(src_sorted, tgt_keys) & target.mask
    return src_in, tgt_in
