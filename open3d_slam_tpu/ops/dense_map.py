"""Device-resident voxelized point cloud — the dense map store.

Mirror of the reference's ``VoxelizedPointCloud`` (``src/Voxel.cpp:49-114``):
a voxel-hash map whose voxels aggregate running means of position / normal /
color (``AggregatedVoxel::aggregatePoint/Normal/Color``, ``Voxel.cpp:27-36``).

TPU design: a fixed-capacity sorted-key store.  Each functional ``insert``
merges the incoming scan's per-voxel sums with the existing store by
concatenate -> sort -> segment-reduce (cumsum differences) -> truncate, all
gather/cumsum (no scatter).  ``remove_keys`` masks voxels by sorted-set
membership (used by dense-map carving, ``helpers.cpp:347-377``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import voxel_coords
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max


_BASE_UNSET = jnp.iinfo(jnp.int32).min  # region base not yet anchored


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelizedPointCloud:
    """Fixed-capacity voxel aggregate store, keys ascending (invalid=INT32_MAX).

    Sums (not means) are stored so merges are exact; ``to_point_cloud``
    divides by counts.

    Keys are COLLISION-FREE packed voxel coords relative to ``region_base``
    (matching the reference's exact ``Vector3i`` map keys,
    ``VoxelHashMap.hpp:25-35``) — a hash key here would merge two far-apart
    voxels' position/color means into one bogus blended point on collision.
    The base is anchored by the first ``insert`` at the scan's center, which
    covers EXACT_EXTENT voxels (129 m at 0.1 m) — generous for a
    radius-bounded per-submap dense map; points beyond it are dropped.
    """

    keys: jnp.ndarray        # (C,) int32 sorted; INT32_MAX = empty slot
    pos_sum: jnp.ndarray     # (C, 3) float32
    normal_sum: jnp.ndarray  # (C, 3) float32 (zeros if unused)
    color_sum: jnp.ndarray   # (C, 3) float32 (zeros if unused)
    count: jnp.ndarray       # (C,) float32
    voxel_size: jnp.ndarray  # () float32
    region_base: jnp.ndarray  # (3,) int32 voxel coord; _BASE_UNSET until anchored

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum((self.keys != INT32_MAX).astype(jnp.int32))


def empty(capacity: int, voxel_size) -> VoxelizedPointCloud:
    return VoxelizedPointCloud(
        keys=jnp.full((capacity,), INT32_MAX, jnp.int32),
        pos_sum=jnp.zeros((capacity, 3), jnp.float32),
        normal_sum=jnp.zeros((capacity, 3), jnp.float32),
        color_sum=jnp.zeros((capacity, 3), jnp.float32),
        count=jnp.zeros((capacity,), jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        region_base=jnp.full((3,), _BASE_UNSET, jnp.int32),
    )


def _segment_reduce(keys: jnp.ndarray, vals: Tuple[jnp.ndarray, ...], capacity: int):
    """Sort by key and sum values per unique key; output first ``capacity``
    unique keys (ascending) + summed values.  All gather/cumsum."""
    order = jnp.argsort(keys)
    ks = keys[order]
    valid = ks != INT32_MAX
    prev = jnp.concatenate([jnp.full((1,), -2147483648, jnp.int32), ks[:-1]])
    starts = (ks != prev) & valid
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    seg_id = jnp.where(valid, seg_id, jnp.int32(keys.shape[0] + 1))
    slots = jnp.arange(capacity, dtype=jnp.int32)
    start_pos = jnp.searchsorted(seg_id, slots, side="left")
    end_pos = jnp.searchsorted(seg_id, slots, side="right")
    out_keys = jnp.where(end_pos > start_pos,
                         ks[jnp.clip(start_pos, 0, ks.shape[0] - 1)], INT32_MAX)

    def reduce(v):
        vs = v[order]
        vs = jnp.where(valid[:, None], vs, 0.0) if vs.ndim == 2 else jnp.where(valid, vs, 0.0)
        cs = jnp.cumsum(vs, axis=0)
        zero = jnp.zeros_like(cs[:1])
        cs = jnp.concatenate([zero, cs], axis=0)
        return cs[end_pos] - cs[start_pos]

    return out_keys, tuple(reduce(v) for v in vals)


@jax.jit
def insert(vm: VoxelizedPointCloud, pc: PointCloud) -> VoxelizedPointCloud:
    """Aggregate a cloud into the store (``VoxelizedPointCloud::insert``,
    ``Voxel.cpp:66-88``).  Overflow beyond capacity drops the largest-key
    voxels; callers size capacity to avoid it.

    The first insert anchors ``region_base`` at the scan's masked-mean
    coordinate; all keys are exact within the 1290^3-voxel region around it.
    Valid points outside the region (>= ~64 m from the anchor at 0.1 m
    voxels — beyond any radius-bounded submap cropper) are dropped."""
    from open3d_slam_tpu.ops.voxel import pack_coords, region_base_from_center
    coords = voxel_coords(pc.points, vm.voxel_size)
    n_valid = jnp.clip(jnp.sum(pc.mask.astype(jnp.float32)), 1.0, None)
    center = jnp.sum(jnp.where(pc.mask[:, None], coords.astype(jnp.float32), 0.0),
                     axis=0) / n_valid
    fresh_base = region_base_from_center(center.astype(jnp.int32))
    base = jnp.where(vm.region_base[0] == _BASE_UNSET, fresh_base,
                     vm.region_base)
    packed = pack_coords(coords, base)
    keys_new = jnp.where(pc.mask & (packed >= 0), packed, INT32_MAX)
    pos_new = jnp.where(pc.mask[:, None], pc.points, 0.0)
    nrm_new = (jnp.where(pc.mask[:, None], pc.normals, 0.0)
               if pc.normals is not None else jnp.zeros_like(pos_new))
    col_new = (jnp.where(pc.mask[:, None], pc.colors, 0.0)
               if pc.colors is not None else jnp.zeros_like(pos_new))
    cnt_new = pc.mask.astype(jnp.float32)

    keys = jnp.concatenate([vm.keys, keys_new])
    pos = jnp.concatenate([vm.pos_sum, pos_new])
    nrm = jnp.concatenate([vm.normal_sum, nrm_new])
    col = jnp.concatenate([vm.color_sum, col_new])
    cnt = jnp.concatenate([vm.count, cnt_new])

    out_keys, (pos_s, nrm_s, col_s, cnt_s) = _segment_reduce(
        keys, (pos, nrm, col, cnt[:, None]), vm.capacity)
    return VoxelizedPointCloud(
        keys=out_keys, pos_sum=pos_s, normal_sum=nrm_s, color_sum=col_s,
        count=cnt_s[:, 0], voxel_size=vm.voxel_size, region_base=base)


@jax.jit
def remove_keys(vm: VoxelizedPointCloud, keys_to_remove_sorted: jnp.ndarray,
                region_base: jnp.ndarray,
                neighbor_deltas: jnp.ndarray | None = None) -> VoxelizedPointCloud:
    """Flush voxels that match a sorted EXACT-key removal set (carving).

    ``keys_to_remove_sorted`` are collision-free packed keys relative to
    ``region_base`` (``carving.carved_voxel_keys``); each store voxel is
    re-keyed exactly from its aggregate mean (the mean of a voxel's points
    lies inside that voxel), so a distant hash collision can never flush a
    valid voxel — matching the reference's exact ``Vector3i`` comparisons.

    ``neighbor_deltas`` (optional, (K,) int32 packed-key deltas — e.g.
    ``carving.FACE_NEIGHBOR_DELTAS``): also flush a voxel when any of its
    delta-shifted keys is in the set.  Because pack_coords is linear and the
    face-offset set is negation-symmetric, this equals expanding each
    visited sample by the same neighborhood on the producer side, at map
    capacity x K lookups instead of rays x steps x K keys.
    """
    from open3d_slam_tpu.ops.voxel import pack_coords
    valid = vm.keys != INT32_MAX
    mean = vm.pos_sum / jnp.clip(vm.count, 1.0, None)[:, None]
    exact = pack_coords(voxel_coords(mean, vm.voxel_size), region_base)  # (C,)
    exact = jnp.where(valid, exact, jnp.int32(-1))
    if neighbor_deltas is None:
        probe = exact[:, None]                                 # (C, 1)
    else:
        probe = exact[:, None] + neighbor_deltas[None, :]      # (C, K)
    # Out-of-region voxels (exact == -1) may only probe to tiny values near
    # -1; removal-set keys are >= 0 or INT32_MAX, and a -1 +- delta can never
    # equal a real in-region key of a DIFFERENT voxel only if we gate:
    probe = jnp.where(exact[:, None] >= 0, probe, jnp.int32(-1))
    pos = jnp.searchsorted(keys_to_remove_sorted, probe, side="left")
    pos = jnp.clip(pos, 0, keys_to_remove_sorted.shape[0] - 1)
    hit = jnp.any((keys_to_remove_sorted[pos] == probe) & (probe >= 0), axis=-1) & valid
    # Mark removed slots empty; keep arrays sorted by pushing keys to INT32_MAX
    # and re-sorting (stable w.r.t. remaining keys).
    keys = jnp.where(hit, INT32_MAX, vm.keys)
    order = jnp.argsort(keys)
    return VoxelizedPointCloud(
        keys=keys[order],
        pos_sum=jnp.where(hit[:, None], 0.0, vm.pos_sum)[order],
        normal_sum=jnp.where(hit[:, None], 0.0, vm.normal_sum)[order],
        color_sum=jnp.where(hit[:, None], 0.0, vm.color_sum)[order],
        count=jnp.where(hit, 0.0, vm.count)[order],
        voxel_size=vm.voxel_size,
        region_base=vm.region_base,
    )


@jax.jit
def transform(vm: VoxelizedPointCloud, T: jnp.ndarray) -> VoxelizedPointCloud:
    """Rigidly move the aggregate means (``VoxelizedPointCloud::transform``,
    ``Voxel.cpp:49-64``).  Keys are recomputed from the moved means; the
    region base is re-anchored at the moved centroid so a chain of
    loop-closure corrections cannot walk the map out of its key region."""
    from open3d_slam_tpu.ops.voxel import pack_coords, region_base_from_center
    cnt = jnp.clip(vm.count, 1.0, None)[:, None]
    mean = vm.pos_sum / cnt
    R = T[:3, :3]
    mean_t = mean @ R.T + T[:3, 3]
    nrm_t = (vm.normal_sum / cnt) @ R.T
    valid = vm.keys != INT32_MAX
    coords = voxel_coords(mean_t, vm.voxel_size)
    n_valid = jnp.clip(jnp.sum(valid.astype(jnp.float32)), 1.0, None)
    center = jnp.sum(jnp.where(valid[:, None], coords.astype(jnp.float32), 0.0),
                     axis=0) / n_valid
    base = jnp.where(vm.region_base[0] == _BASE_UNSET, vm.region_base,
                     region_base_from_center(center.astype(jnp.int32)))
    packed = pack_coords(coords, base)
    keys = jnp.where(valid & (packed >= 0), packed, INT32_MAX)
    order = jnp.argsort(keys)
    return VoxelizedPointCloud(
        keys=keys[order],
        pos_sum=(mean_t * vm.count[:, None])[order],
        normal_sum=(nrm_t * vm.count[:, None])[order],
        color_sum=vm.color_sum[order],
        count=vm.count[order],
        voxel_size=vm.voxel_size,
        region_base=base,
    )


@jax.jit
def to_point_cloud(vm: VoxelizedPointCloud) -> PointCloud:
    """Aggregate means as a padded PointCloud (``toPointCloud``,
    ``Voxel.cpp:90-114``)."""
    valid = vm.keys != INT32_MAX
    cnt = jnp.clip(vm.count, 1.0, None)[:, None]
    pts = vm.pos_sum / cnt
    nrm = vm.normal_sum / cnt
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.where(nlen > 1e-9, nrm / jnp.clip(nlen, 1e-9, None), 0.0)
    col = vm.color_sum / cnt
    return PointCloud(points=pts, mask=valid, normals=nrm, colors=col)
