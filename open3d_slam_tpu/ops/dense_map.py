"""Device-resident voxelized point cloud — the dense map store.

Mirror of the reference's ``VoxelizedPointCloud`` (``src/Voxel.cpp:49-114``):
a voxel-hash map whose voxels aggregate running means of position / normal /
color (``AggregatedVoxel::aggregatePoint/Normal/Color``, ``Voxel.cpp:27-36``).

TPU design: a fixed-capacity sorted-key store.  Each functional ``insert``
merges the incoming scan with the existing store through ONE multi-operand
``lax.sort`` that carries every aggregate channel alongside the key
(measured on v5e: ~10x cheaper than the argsort + per-channel gather +
store-sized ``searchsorted`` chain), then segment sums via one cumsum and
one boundary-row gather.  ``remove_keys`` masks voxels by sorted-set
membership (used by dense-map carving, ``helpers.cpp:347-377``).

Positions are aggregated as VOXEL-CENTER-RELATIVE residual sums
(``resid_sum``): a float32 running sum of absolute coordinates loses up to
decimetres to cumsum cancellation at map scale, while residuals are bounded
by half a voxel.  The absolute mean is reconstructed as
``key-decoded center + resid_sum / count``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import (pack_coords, region_base_from_center,
                                       voxel_coords)
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max


_BASE_UNSET = jnp.iinfo(jnp.int32).min  # region base not yet anchored


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelizedPointCloud:
    """Fixed-capacity voxel aggregate store, keys ascending (invalid=INT32_MAX).

    Sums (not means) are stored so merges are exact; ``to_point_cloud``
    divides by counts.  ``resid_sum`` sums voxel-center-relative residuals
    (see module docstring).

    Keys are COLLISION-FREE packed voxel coords relative to ``region_base``
    (matching the reference's exact ``Vector3i`` map keys,
    ``VoxelHashMap.hpp:25-35``) — a hash key here would merge two far-apart
    voxels' position/color means into one bogus blended point on collision.
    The base is anchored by the first ``insert`` at the scan's center, which
    covers EXACT_EXTENT voxels (129 m at 0.1 m) — generous for a
    radius-bounded per-submap dense map; points beyond it are dropped.
    """

    keys: jnp.ndarray        # (C,) int32 sorted; INT32_MAX = empty slot
    resid_sum: jnp.ndarray   # (C, 3) float32, voxel-center-relative
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

    def _means(self) -> jnp.ndarray:
        """Absolute per-voxel means (garbage at empty slots).  voxel_size is
        a traced scalar here, so the key decode is done inline rather than
        through ``voxel.unpack_key_centers`` (static voxel_size)."""
        from open3d_slam_tpu.ops.voxel import EXACT_EXTENT
        e = jnp.int32(EXACT_EXTENT)
        k = jnp.maximum(self.keys, 0)
        coords = jnp.stack([k // (e * e), (k // e) % e, k % e], axis=-1) \
            + self.region_base
        centers = (coords.astype(jnp.float32) + 0.5) * self.voxel_size
        return centers + self.resid_sum / jnp.clip(self.count, 1.0, None)[:, None]


def empty(capacity: int, voxel_size) -> VoxelizedPointCloud:
    return VoxelizedPointCloud(
        keys=jnp.full((capacity,), INT32_MAX, jnp.int32),
        resid_sum=jnp.zeros((capacity, 3), jnp.float32),
        normal_sum=jnp.zeros((capacity, 3), jnp.float32),
        color_sum=jnp.zeros((capacity, 3), jnp.float32),
        count=jnp.zeros((capacity,), jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        region_base=jnp.full((3,), _BASE_UNSET, jnp.int32),
    )


def _segment_reduce(keys: jnp.ndarray, vals: Tuple[jnp.ndarray, ...],
                    capacity: int):
    """Sort by key and sum values per unique key; output first ``capacity``
    unique keys (ascending) + summed values.  ONE multi-operand sort (the
    comparator network carries the value channels), one cumsum, one
    boundary-row gather — no argsort-then-gather, no searchsorted."""
    n = keys.shape[0]
    cols = []
    widths = []
    for v in vals:
        v2 = v if v.ndim == 2 else v[:, None]
        widths.append(v2.shape[1])
        cols.extend(v2[:, i] for i in range(v2.shape[1]))
    sorted_ops = jax.lax.sort((keys,) + tuple(cols), num_keys=1)
    ks = sorted_ops[0]
    V = jnp.stack(sorted_ops[1:], axis=1)              # (n, D)
    valid = ks != INT32_MAX
    V = jnp.where(valid[:, None], V, 0.0)
    starts = ((ks != jnp.roll(ks, 1))) & valid
    starts = starts.at[0].set(valid[0])
    csum = jnp.concatenate([jnp.zeros((1, V.shape[1]), jnp.float32),
                            jnp.cumsum(V, axis=0)], axis=0)
    bounded = jnp.sort(jnp.where(starts, jnp.arange(n, dtype=jnp.int32),
                                 jnp.int32(n)))
    bounded_ext = jnp.concatenate([bounded, jnp.full((1,), n, jnp.int32)])
    edges = bounded_ext[jnp.minimum(jnp.arange(capacity + 1), n)]
    g = csum[edges]
    d = g[1:] - g[:-1]
    ks_pad = jnp.concatenate([ks, jnp.full((1,), INT32_MAX, jnp.int32)])
    out_keys = ks_pad[edges[:capacity]]
    outs = []
    off = 0
    for v, w in zip(vals, widths):
        chunk = d[:, off:off + w]
        outs.append(chunk if v.ndim == 2 else chunk[:, 0])
        off += w
    return out_keys, tuple(outs)


@jax.jit
def insert(vm: VoxelizedPointCloud, pc: PointCloud) -> VoxelizedPointCloud:
    """Aggregate a cloud into the store (``VoxelizedPointCloud::insert``,
    ``Voxel.cpp:66-88``).  Overflow beyond capacity drops the largest-key
    voxels; callers size capacity to avoid it.

    The first insert anchors ``region_base`` at the scan's masked-mean
    coordinate; all keys are exact within the 1290^3-voxel region around it.
    Valid points outside the region (>= ~64 m from the anchor at 0.1 m
    voxels — beyond any radius-bounded submap cropper) are dropped."""
    coords = voxel_coords(pc.points, vm.voxel_size)
    n_valid = jnp.clip(jnp.sum(pc.mask.astype(jnp.float32)), 1.0, None)
    center = jnp.sum(jnp.where(pc.mask[:, None], coords.astype(jnp.float32), 0.0),
                     axis=0) / n_valid
    fresh_base = region_base_from_center(center.astype(jnp.int32))
    base = jnp.where(vm.region_base[0] == _BASE_UNSET, fresh_base,
                     vm.region_base)
    packed = pack_coords(coords, base)
    keys_new = jnp.where(pc.mask & (packed >= 0), packed, INT32_MAX)
    # voxel-center-relative residuals (bounded by +-voxel/2)
    centers = (coords.astype(jnp.float32) + 0.5) * vm.voxel_size
    res_new = jnp.where(pc.mask[:, None], pc.points - centers, 0.0)
    nrm_new = (jnp.where(pc.mask[:, None], pc.normals, 0.0)
               if pc.normals is not None else jnp.zeros_like(res_new))
    col_new = (jnp.where(pc.mask[:, None], pc.colors, 0.0)
               if pc.colors is not None else jnp.zeros_like(res_new))
    cnt_new = pc.mask.astype(jnp.float32)

    keys = jnp.concatenate([vm.keys, keys_new])
    res = jnp.concatenate([vm.resid_sum, res_new])
    nrm = jnp.concatenate([vm.normal_sum, nrm_new])
    col = jnp.concatenate([vm.color_sum, col_new])
    cnt = jnp.concatenate([vm.count, cnt_new])

    out_keys, (res_s, nrm_s, col_s, cnt_s) = _segment_reduce(
        keys, (res, nrm, col, cnt), vm.capacity)
    return VoxelizedPointCloud(
        keys=out_keys, resid_sum=res_s, normal_sum=nrm_s, color_sum=col_s,
        count=cnt_s, voxel_size=vm.voxel_size, region_base=base)


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
    valid = vm.keys != INT32_MAX
    mean = vm._means()
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
    # Mark removed slots empty; keep arrays sorted by pushing keys to
    # INT32_MAX via ONE multi-operand sort that carries the channels.
    keys = jnp.where(hit, INT32_MAX, vm.keys)
    drop = hit[:, None]
    sorted_ops = jax.lax.sort(
        (keys,
         *(jnp.where(drop, 0.0, vm.resid_sum)[:, i] for i in range(3)),
         *(jnp.where(drop, 0.0, vm.normal_sum)[:, i] for i in range(3)),
         *(jnp.where(drop, 0.0, vm.color_sum)[:, i] for i in range(3)),
         jnp.where(hit, 0.0, vm.count)),
        num_keys=1)
    return VoxelizedPointCloud(
        keys=sorted_ops[0],
        resid_sum=jnp.stack(sorted_ops[1:4], axis=1),
        normal_sum=jnp.stack(sorted_ops[4:7], axis=1),
        color_sum=jnp.stack(sorted_ops[7:10], axis=1),
        count=sorted_ops[10],
        voxel_size=vm.voxel_size,
        region_base=vm.region_base,
    )


@jax.jit
def transform(vm: VoxelizedPointCloud, T: jnp.ndarray) -> VoxelizedPointCloud:
    """Rigidly move the aggregate means (``VoxelizedPointCloud::transform``,
    ``Voxel.cpp:49-64``).  Keys are recomputed from the moved means; the
    region base is re-anchored at the moved centroid so a chain of
    loop-closure corrections cannot walk the map out of its key region."""
    cnt = jnp.clip(vm.count, 1.0, None)[:, None]
    mean = vm._means()
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
    centers_t = (coords.astype(jnp.float32) + 0.5) * vm.voxel_size
    resid_t = jnp.where(valid[:, None], (mean_t - centers_t) * vm.count[:, None],
                        0.0)
    sorted_ops = jax.lax.sort(
        (keys,
         *(resid_t[:, i] for i in range(3)),
         *((nrm_t * vm.count[:, None])[:, i] for i in range(3)),
         *(vm.color_sum[:, i] for i in range(3)),
         vm.count),
        num_keys=1)
    return VoxelizedPointCloud(
        keys=sorted_ops[0],
        resid_sum=jnp.stack(sorted_ops[1:4], axis=1),
        normal_sum=jnp.stack(sorted_ops[4:7], axis=1),
        color_sum=jnp.stack(sorted_ops[7:10], axis=1),
        count=sorted_ops[10],
        voxel_size=vm.voxel_size,
        region_base=base,
    )


@jax.jit
def to_point_cloud(vm: VoxelizedPointCloud) -> PointCloud:
    """Aggregate means as a padded PointCloud (``toPointCloud``,
    ``Voxel.cpp:90-114``)."""
    valid = vm.keys != INT32_MAX
    cnt = jnp.clip(vm.count, 1.0, None)[:, None]
    pts = jnp.where(valid[:, None], vm._means(), 0.0)
    nrm = vm.normal_sum / cnt
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.where(nlen > 1e-9, nrm / jnp.clip(nlen, 1e-9, None), 0.0)
    col = vm.color_sum / cnt
    return PointCloud(points=pts, mask=valid, normals=nrm, colors=col)
