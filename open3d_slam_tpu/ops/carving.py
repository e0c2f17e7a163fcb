"""Space carving: free-space ray-march removal of stale map points.

Mirror of the reference's carving helpers:
  * sparse-map carve ``getIdxsOfCarvedPoints`` (``helpers.cpp:235-271``):
    march each scan ray from the sensor in steps of the carve voxel size up to
    ``max(voxel, min(range - truncation, max_ray_len))``; map points living in
    any visited voxel are removed, gated by ``|ray_dir . normal| > min_dot``;
  * dense-map carve ``getKeysOfCarvedPoints`` (``helpers.cpp:347-377``):
    step = 2 * neighborhood radius, removes visited voxel keys (with their
    neighborhood) from the dense voxel store.

TPU design: instead of per-ray serial DDA + hash-set inserts (OpenMP +
critical sections in the reference), ALL rays' step samples are generated as
one (N_rays x N_steps) batch of voxel keys, sorted once, and map points test
membership with a vectorized binary search — zero scatter, one sort.

Membership keys are EXACT (collision-free): voxel coords are packed relative
to the sensor's voxel (``voxel.pack_coords``) so every voxel within
EXACT_EXTENT/2 (~645) voxels of the sensor gets a unique int32 — the
reference compares exact ``Vector3i`` keys (``VoxelHashMap.hpp:25-35``), and
an additive-hash collision here would delete a valid map point permanently.
Out-of-region map points get sentinel -1 and are conservatively kept (they
are beyond ``max_ray_length`` anyway whenever max_ray/voxel <= 645).

The normal-dot gate uses the map-point->sensor direction instead of each
individual ray's direction; rays visiting a given voxel all pass near it and
the sensor, so the directions agree to within the voxel's angular size —
equivalent up to discretization.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import (EXACT_EXTENT, pack_coords,
                                       region_base_from_center, voxel_coords)
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max

# Per-axis packed-key multipliers: key = relx*E^2 + rely*E + relz.
_AXIS_MULT = (EXACT_EXTENT * EXACT_EXTENT, EXACT_EXTENT, 1)


def _sensor_base(sensor_position: jnp.ndarray, key_voxel_size) -> jnp.ndarray:
    inv = 1.0 / jnp.asarray(key_voxel_size, jnp.float32)
    center = jnp.floor(sensor_position * inv).astype(jnp.int32)
    return region_base_from_center(center)


def _ray_visit_keys(scan_points: jnp.ndarray, scan_mask: jnp.ndarray,
                    sensor_position: jnp.ndarray, step_size,
                    truncation_distance, max_ray_length,
                    key_voxel_size, max_steps: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sorted exact keys of all voxels visited by the scan's rays, region base).

    Invalid samples get INT32_MAX (sorted to the tail).  Shape (N * S,).

    Everything is computed per-axis in rank-2 (N, S) tensors: a fused
    (N, S, 3) position tensor looks harmless but TPU tiled layouts pad the
    trailing 3 up to a full 128-lane tile, inflating HBM use ~40x (observed
    as a 21 GB allocation on a 16 GB v5e with the raw-scan capacity).
    """
    step_size = jnp.asarray(step_size, jnp.float32)
    base = _sensor_base(sensor_position, key_voxel_size)
    d = scan_points - sensor_position[None, :]
    length = jnp.linalg.norm(d, axis=-1)                    # (N,)
    direction = d / jnp.clip(length[:, None], 1e-9, None)   # (N, 3)
    max_path = jnp.maximum(step_size,
                           jnp.minimum(length - truncation_distance, max_ray_length))
    steps = jnp.arange(max_steps, dtype=jnp.float32)[None, :] * step_size  # (1, S)
    inv = 1.0 / jnp.asarray(key_voxel_size, jnp.float32)
    keys = jnp.zeros((scan_points.shape[0], max_steps), jnp.int32)
    in_range = jnp.ones((scan_points.shape[0], max_steps), bool)
    for a, mult in enumerate(_AXIS_MULT):
        pos_a = sensor_position[a] + direction[:, a:a + 1] * steps         # (N, S)
        rel_a = jnp.floor(pos_a * inv).astype(jnp.int32) - base[a]
        in_range &= (rel_a >= 0) & (rel_a < EXACT_EXTENT)
        keys = keys + rel_a * jnp.int32(mult)
    valid = (steps < max_path[:, None]) & scan_mask[:, None] & in_range    # (N, S)
    keys = jnp.where(valid, keys, INT32_MAX)
    return jnp.sort(keys.reshape(-1)), base


@partial(jax.jit, static_argnames=("max_steps",))
def carve_mask(map_pc: PointCloud, scan_pc: PointCloud,
               sensor_position: jnp.ndarray,
               voxel_size, truncation_distance, max_ray_length,
               min_dot_product_with_normal,
               max_steps: int = 256) -> jnp.ndarray:
    """Boolean keep-mask over ``map_pc`` after carving with ``scan_pc``.

    ``max_steps`` must satisfy max_steps * voxel_size >= max_ray_length for
    full coverage (callers size it from config).
    """
    keys_sorted, base = _ray_visit_keys(
        scan_pc.points, scan_pc.mask, sensor_position,
        step_size=voxel_size, truncation_distance=truncation_distance,
        max_ray_length=max_ray_length, key_voxel_size=voxel_size,
        max_steps=max_steps)
    # Exact keys for the map side; out-of-region -> -1 (never matches a
    # sample key, which is >= 0 or INT32_MAX) -> conservative keep.
    map_keys = pack_coords(voxel_coords(map_pc.points, voxel_size), base)
    pos = jnp.searchsorted(keys_sorted, map_keys, side="left")
    pos = jnp.clip(pos, 0, keys_sorted.shape[0] - 1)
    hit = (keys_sorted[pos] == map_keys) & (map_keys >= 0)

    if map_pc.normals is not None:
        to_pt = map_pc.points - sensor_position[None, :]
        dirs = to_pt / jnp.clip(jnp.linalg.norm(to_pt, axis=-1, keepdims=True), 1e-9, None)
        n = map_pc.normals
        n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9, None)
        dot = jnp.abs(jnp.sum(dirs * n, axis=-1))
        gate = dot > min_dot_product_with_normal
    else:
        gate = jnp.ones_like(hit)

    remove = hit & gate & map_pc.mask
    return map_pc.mask & ~remove


# Face-neighborhood deltas in PACKED key space: pack_coords is linear in the
# coords, so key(c + o) == key(c) + delta(o) whenever both stay in-region.
# The offset set {0, +-e1, +-e2, +-e3} is symmetric under negation, so
# "sample visits any neighbor of voxel v" == "v + offset is a visited sample
# voxel" — the neighborhood test can run on the (much smaller) map side.
FACE_NEIGHBOR_DELTAS = jnp.array(
    [0,
     _AXIS_MULT[0], -_AXIS_MULT[0],
     _AXIS_MULT[1], -_AXIS_MULT[1],
     1, -1],
    jnp.int32)


@partial(jax.jit, static_argnames=("max_steps",))
def carved_voxel_keys(scan_pc: PointCloud, sensor_position: jnp.ndarray,
                      dense_voxel_size, neighborhood_radius,
                      truncation_distance, max_ray_length,
                      max_steps: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sorted exact keys of ray-visited dense-map voxel samples, region base)
    (``helpers.cpp:347-377``).

    Step size = 2 * neighborhood radius.  Each sample flushes the voxels
    whose centers lie within the neighborhood radius; the center-voxel +
    face-neighborhood expansion (covers radius <= voxel) is applied by the
    CONSUMER on the map side (see ``dense_map.remove_keys`` with
    ``FACE_NEIGHBOR_DELTAS``) — emitting 7 keys per sample here would build
    an (N, S, 7) tensor 7x the size for the identical removal set.  The
    consumer must re-key its own voxels with the returned ``base``.
    """
    step = 2.0 * jnp.asarray(neighborhood_radius, jnp.float32)
    return _ray_visit_keys(scan_pc.points, scan_pc.mask, sensor_position,
                           step_size=step,
                           truncation_distance=truncation_distance,
                           max_ray_length=max_ray_length,
                           key_voxel_size=dense_voxel_size,
                           max_steps=max_steps)
