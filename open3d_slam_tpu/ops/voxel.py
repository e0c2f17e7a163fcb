"""Voxel ops: voxel keys, voxel downsampling, within-volume voxelization,
duplicate removal.

TPU-native replacements for the reference's voxel machinery:
  * key semantics  — floor(p / voxel_size), as ``VoxelHashMap.hpp:47-50``.
  * voxel_downsample — mean position/normal/color per voxel, as Open3D's
    ``VoxelDownSample`` used at ``helpers.cpp:107-113``.
  * voxelize_within_cropping_volume — points outside the volume pass through,
    points inside are voxel-averaged (``helpers.cpp:115-183``).
  * remove_duplicate_points_in_voxels — keep one point per voxel
    (``Voxel.cpp:162-191``).

Everything is static-shape: clouds are padded ``PointCloud`` pytrees and
"removal" toggles mask bits.  Unique-voxel segmentation uses a collision-free
lexicographic sort of integer voxel coords (3 stable sort passes) rather than
a hash, so voxel merging is exact.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max


def voxel_coords(points: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Integer voxel coordinates, floor(p / voxel_size) (int32)."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def hash_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Spatial hash of int32 voxel coords -> int32 (wrapping arithmetic).

    Additive large-prime hash (same family as the reference's
    ``x + 17191*y + 17191^2*z``, ``VoxelHashMap.hpp:25-35``).  Additive — not
    XOR — so that no two cells within any small neighborhood can collide:
    p1*dx + p2*dy + p3*dz == 0 (mod 2^32) has no small-integer solutions for
    these primes, which guarantees the 27-cell query never double-counts a
    point.  Distant collisions only add candidates that the Euclidean
    distance check rejects.
    """
    x = coords[..., 0] * jnp.int32(73856093)
    y = coords[..., 1] * jnp.int32(19349669)
    z = coords[..., 2] * jnp.int32(83492791)
    return x + y + z


# Collision-FREE packed keys for membership tests (carving / overlap /
# occupancy).  The reference compares exact Vector3i keys
# (``VoxelHashMap.hpp:25-35`` hashes only for bucketing); an additive int32
# hash has distant collisions (e.g. coords differing by (-152,-951,-211)
# collide), and a collision in a membership test deletes a valid map point
# permanently.  Instead we pack coords relative to a region base:
# EXACT_EXTENT^3 = 2,146,689,000 < 2^31, so any coord inside a
# 1290^3-voxel region gets a unique non-negative int32; coords outside get
# sentinel -1 ("never matches", conservative keep).
EXACT_EXTENT = 1290


def pack_coords(coords: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Exact int32 key of int32 voxel ``coords`` relative to ``base`` (3,).

    In-region keys are unique in [0, EXACT_EXTENT^3); out-of-region -> -1.
    The packing is linear, so neighbor offsets are key deltas:
    +-x -> +-EXACT_EXTENT^2, +-y -> +-EXACT_EXTENT, +-z -> +-1.
    """
    rel = coords - base
    in_range = jnp.all((rel >= 0) & (rel < EXACT_EXTENT), axis=-1)
    packed = (rel[..., 0] * jnp.int32(EXACT_EXTENT) + rel[..., 1]) * \
        jnp.int32(EXACT_EXTENT) + rel[..., 2]
    return jnp.where(in_range, packed, jnp.int32(-1))


def region_base_from_center(center_coord: jnp.ndarray) -> jnp.ndarray:
    """Region base such that ``center_coord`` sits at the region center."""
    return center_coord - jnp.int32(EXACT_EXTENT // 2)


def _lex_order(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Stable lexicographic argsort of voxel coords; invalid entries last."""
    n = coords.shape[0]
    order = jnp.arange(n)
    # Three stable sort passes: x (least significant) .. then z, then validity.
    for axis in (0, 1, 2):
        key = coords[order, axis]
        order = order[jnp.argsort(key, stable=True)]
    key = (~valid[order]).astype(jnp.int32)
    order = order[jnp.argsort(key, stable=True)]
    return order


def _order_by_coords(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Group-identical-voxels argsort: ONE packed-key sort when the valid
    coord span fits the exact-pack region (always true for crop-bounded
    scans/submaps), the 4-pass stable lexicographic sort otherwise (e.g.
    whole-trajectory visualization clouds).  Sorting dominates the voxel
    pipeline on TPU, so the single-key path is ~4x cheaper.

    Stable within equal keys (original order preserved); invalid entries
    sort last.  NOTE: the two branches produce different (but each
    deterministic) voxel orders — (x,y,z)-lex vs (z,y,x)-lex; downstream
    only relies on identical voxels being contiguous.
    """
    big = jnp.int32(INT32_MAX)
    cmin = jnp.min(jnp.where(valid[:, None], coords, big), axis=0)
    span_ok = jnp.all(
        jnp.max(jnp.where(valid[:, None], coords - cmin, 0), axis=0)
        < EXACT_EXTENT) & jnp.any(valid)

    def packed(_):
        key = pack_coords(coords, cmin)        # unique for in-region coords
        key = jnp.where(valid, key, big)
        return jnp.argsort(key, stable=True).astype(jnp.int32)

    def lex(_):
        return _lex_order(coords, valid).astype(jnp.int32)

    return jax.lax.cond(span_ok, packed, lex, None)


def _segment_starts(coords_sorted: jnp.ndarray, valid_sorted: jnp.ndarray) -> jnp.ndarray:
    """Boolean start-of-segment flags over lexicographically sorted coords."""
    prev = jnp.roll(coords_sorted, 1, axis=0)
    diff = jnp.any(coords_sorted != prev, axis=-1)
    diff = diff.at[0].set(True)
    return diff & valid_sorted


@partial(jax.jit, static_argnames=("voxel_size", "out_capacity"))
def voxel_downsample(pc: PointCloud, voxel_size: float,
                     out_capacity: Optional[int] = None) -> PointCloud:
    """Voxel-grid downsample: mean of positions (and normals/colors) per voxel.

    Matches Open3D ``VoxelDownSample`` semantics (mean aggregation).  Output
    is a padded cloud of ``out_capacity`` (default: same as input capacity),
    valid points compacted to the front in lexicographic voxel order.

    TPU note: implemented as sort + prefix-sum + gather (segment sums via
    cumsum differences at segment boundaries) — XLA scatter is serial on TPU
    and ~1000x slower, so no ``segment_sum``/``.at[].add`` anywhere here.
    """
    n = pc.capacity
    out_capacity = out_capacity or n
    coords = voxel_coords(pc.points, voxel_size)
    order = _order_by_coords(coords, pc.mask)
    coords_s = coords[order]
    valid_s = pc.mask[order]
    starts = _segment_starts(coords_s, valid_s)
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    # Invalid points (sorted to the tail) get a sentinel so boundary searches
    # over seg_id stay monotonic.
    seg_id = jnp.where(valid_s, seg_id, jnp.int32(n + 1))

    # Segment boundaries for output slots 0..out_capacity-1.  When the
    # unique-voxel count exceeds out_capacity, select a UNIFORM stride of
    # segments instead of the lexicographic prefix — a prefix truncation
    # silently drops one spatial side of the cloud (lowest-z voxels sort
    # first), which starves downstream feature matching; a stride keeps the
    # subsample spatially unbiased.
    n_segments = jnp.max(jnp.where(valid_s, seg_id, -1)) + 1
    idx = jnp.arange(out_capacity, dtype=jnp.int32)
    stride = n_segments.astype(jnp.float32) / jnp.float32(out_capacity)
    strided = jnp.floor(idx.astype(jnp.float32) * stride).astype(jnp.int32)
    slots = jnp.where(n_segments > out_capacity, strided, idx)
    # Segment-start position table via ONE int sort + gathers: measured on
    # TPU v5e this is ~4x cheaper than the two vectorized binary searches
    # (searchsorted costs ~queries*log(n) serial gather steps; a 278k int32
    # sort is ~12 ms vs ~48 ms per searchsorted at the submap-insert size).
    # bounded[s] = start position of segment s (s < n_segments), n beyond;
    # valid entries are contiguous at the front, so segment s ends where
    # segment s+1 starts, and the LAST segment ends at the valid count.
    bounded = jnp.sort(jnp.where(starts, jnp.arange(n, dtype=jnp.int32),
                                 jnp.int32(n)))
    n_valid = jnp.sum(valid_s.astype(jnp.int32))
    start_pos = bounded[jnp.minimum(slots, n - 1)]
    nxt = bounded[jnp.minimum(slots + 1, n - 1)]
    end_pos = jnp.where(slots + 1 == n_segments, n_valid,
                        jnp.where(slots + 1 > n_segments, start_pos, nxt))

    def seg_sum(vals_sorted):
        vals_sorted = jnp.where(valid_s[:, None], vals_sorted, 0.0)
        csum = jnp.concatenate(
            [jnp.zeros((1, vals_sorted.shape[1]), vals_sorted.dtype),
             jnp.cumsum(vals_sorted, axis=0)], axis=0)
        return csum[end_pos] - csum[start_pos]

    counts = (end_pos - start_pos).astype(jnp.float32)[:, None]
    denom = jnp.clip(counts, 1.0, None)
    pts = seg_sum(pc.points[order]) / denom
    mask = counts[:, 0] > 0

    normals = None
    if pc.normals is not None:
        normals = seg_sum(pc.normals[order]) / denom
        nn = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / jnp.clip(nn, 1e-12, None)
    colors = None
    if pc.colors is not None:
        colors = seg_sum(pc.colors[order]) / denom
    return PointCloud(points=pts, mask=mask, normals=normals, colors=colors)


@partial(jax.jit, static_argnames=("voxel_size",))
def remove_duplicate_points_in_voxels(pc: PointCloud, voxel_size: float) -> PointCloud:
    """Keep only the first point (in lexicographic voxel order) per voxel.

    Mirrors ``VoxelMap::removeDuplicatePointsWithinSameVoxels``
    (``Voxel.cpp:162-191``).  Mask-only operation (no compaction).
    """
    coords = voxel_coords(pc.points, voxel_size)
    order = _order_by_coords(coords, pc.mask)
    coords_s = coords[order]
    valid_s = pc.mask[order]
    starts = _segment_starts(coords_s, valid_s)
    # keep[order[i]] = starts[i]  — apply the inverse permutation by gather
    # (scatter is serial on TPU).
    inv = jnp.argsort(order)
    keep = starts[inv]
    return pc.with_(mask=pc.mask & keep)


@partial(jax.jit, static_argnames=("voxel_size", "out_capacity"))
def voxelize_within_cropping_volume(pc: PointCloud, voxel_size: float,
                                    inside: jnp.ndarray,
                                    out_capacity: Optional[int] = None) -> PointCloud:
    """Voxel-average points where ``inside`` is True; pass others through.

    Mirrors ``voxelizeWithinCroppingVolume`` (``helpers.cpp:115-183``): points
    outside the cropping volume are kept verbatim, points inside are merged
    per voxel.  If voxel_size <= 0 the input is returned unchanged (reference
    behavior).
    """
    out_capacity = out_capacity or pc.capacity
    if voxel_size <= 0:
        return pc
    inside = inside & pc.mask
    outside = pc.mask & ~inside
    pc_in = pc.with_(mask=inside)
    down = voxel_downsample(pc_in, voxel_size, out_capacity=pc.capacity)
    # Concatenate downsampled-inside + untouched-outside, then compact.
    from open3d_slam_tpu.utils import pointcloud as pclib
    merged = pclib.concat(down, pc.with_(mask=outside), capacity=out_capacity)
    return merged


@partial(jax.jit, static_argnames=("num_samples",))
def random_downsample(pc: PointCloud, num_samples: int, key: jax.Array) -> PointCloud:
    """Seeded uniform subsample to at most ``num_samples`` valid points.

    Replaces Open3D ``RandomDownSample`` (used by odometry preprocessing at
    ``Odometry.cpp:29``) with a deterministic seeded choice.  Mask-only.
    """
    n = pc.capacity
    scores = jax.random.uniform(key, (n,))
    # Invalid points get +inf so they sort last.
    scores = jnp.where(pc.mask, scores, jnp.inf)
    order = jnp.argsort(scores)
    keep_sorted = jnp.arange(n) < num_samples
    inv = jnp.argsort(order)
    keep = keep_sorted[inv]
    return pc.with_(mask=pc.mask & keep)


def voxel_centers(coords: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Center position of voxels given integer coords."""
    return (coords.astype(jnp.float32) + 0.5) * voxel_size
