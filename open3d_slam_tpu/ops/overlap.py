"""Voxel-grid overlap masks between two clouds.

Mirror of ``computeIndicesOfOverlappingPoints`` (``helpers.cpp:307-332``):
points of source (transformed by source->target) and target that share an
occupied voxel (>= 1 point from each side) are selected.  Returns boolean
masks instead of index vectors (static shapes).

Membership uses EXACT packed voxel keys (``voxel.pack_coords``) relative to
the joint minimum coordinate — the reference compares exact ``Vector3i``
keys, and a hash collision here would select non-overlapping points into a
constraint.  Clouds spanning more than EXACT_EXTENT (~1290) voxels per axis
conservatively exclude out-of-region points from the overlap.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import pack_coords, voxel_coords
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max


def _member(sorted_keys: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    pos = jnp.clip(jnp.searchsorted(sorted_keys, query, side="left"),
                   0, sorted_keys.shape[0] - 1)
    return (sorted_keys[pos] == query) & (query >= 0)


@jax.jit
def overlapping_masks(source: PointCloud, target: PointCloud,
                      source_to_target: jnp.ndarray,
                      voxel_size) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(source_mask, target_mask) of points in mutually occupied voxels."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    src_pts = se3.transform_points(source_to_target, source.points)
    src_coords = voxel_coords(src_pts, vs)
    tgt_coords = voxel_coords(target.points, vs)
    # Joint region base: min valid coord over both clouds (exact keys).
    big = jnp.int32(2**30)
    src_min = jnp.min(jnp.where(source.mask[:, None], src_coords, big), axis=0)
    tgt_min = jnp.min(jnp.where(target.mask[:, None], tgt_coords, big), axis=0)
    base = jnp.minimum(src_min, tgt_min)
    src_keys = jnp.where(source.mask, pack_coords(src_coords, base), jnp.int32(-1))
    tgt_keys = jnp.where(target.mask, pack_coords(tgt_coords, base), jnp.int32(-1))
    # Sorted sets: invalid entries become INT32_MAX so -1 queries never match.
    src_sorted = jnp.sort(jnp.where(src_keys >= 0, src_keys, INT32_MAX))
    tgt_sorted = jnp.sort(jnp.where(tgt_keys >= 0, tgt_keys, INT32_MAX))
    src_in = _member(tgt_sorted, src_keys) & source.mask
    tgt_in = _member(src_sorted, tgt_keys) & target.mask
    return src_in, tgt_in
