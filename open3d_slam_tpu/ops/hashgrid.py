"""Device-resident spatial hash grid for fixed-radius nearest-neighbor search.

This replaces the reference's KD-trees (Open3D ``KDTreeFlann`` used from
``CloudRegistration.cpp:25,52`` and ``helpers.cpp:190-200``).  ICP only ever
needs the nearest neighbor within ``max_correspondence_distance`` (~1.5-2x the
voxel size, ``helpers.cpp:87-93``), so a voxel-bucket grid with a 27-cell
neighborhood search is an exact substitute when cell_size >= search radius.

Representation (sorted-array grid — fully static shapes, jit/vmap friendly):
  * each target point is assigned a cell hash (cell = floor(p / cell_size));
  * points are sorted by hash; queries binary-search the sorted hash array for
    each of 27 neighboring cells and scan up to ``bucket_size`` entries.

Hash collisions only inject spurious *candidates*, which the subsequent
Euclidean-distance check rejects; they never cause a wrong nearest neighbor
unless a bucket overflows (bucket_size caps the scan), which is statically
sized to be safe for voxel-downsampled clouds.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.voxel import hash_coords
from open3d_slam_tpu.utils.pointcloud import PointCloud

INT32_MAX = jnp.iinfo(jnp.int32).max

def _neighbor_offsets() -> jnp.ndarray:
    import numpy as np
    offs = np.array(
        [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        dtype=np.int32,
    )
    return jnp.asarray(offs)


OFFSETS_27 = _neighbor_offsets()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HashGrid:
    """Sorted-hash spatial index over a fixed-capacity point set."""

    hashes_sorted: jnp.ndarray   # (N,) int32, ascending; INT32_MAX for invalid
    points_sorted: jnp.ndarray   # (N, 3) float32
    normals_sorted: Optional[jnp.ndarray]  # (N, 3) float32 or None
    order: jnp.ndarray           # (N,) int32 — original index of each slot
    cell_size: jnp.ndarray       # () float32

    @property
    def capacity(self) -> int:
        return self.hashes_sorted.shape[0]


def build(pc: PointCloud, cell_size) -> HashGrid:
    """Build the grid over valid points of ``pc``.  O(N log N) sort."""
    cell_size = jnp.asarray(cell_size, jnp.float32)
    coords = jnp.floor(pc.points / cell_size).astype(jnp.int32)
    h = hash_coords(coords)
    h = jnp.where(pc.mask, h, INT32_MAX)
    order = jnp.argsort(h)
    return HashGrid(
        hashes_sorted=h[order],
        points_sorted=pc.points[order],
        normals_sorted=None if pc.normals is None else pc.normals[order],
        order=order.astype(jnp.int32),
        cell_size=cell_size,
    )


@partial(jax.jit, static_argnames=("bucket_size",))
def query_nearest(grid: HashGrid, query_points: jnp.ndarray, max_dist,
                  bucket_size: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest valid grid point within ``max_dist`` of each query point.

    Requires grid.cell_size >= max_dist for exactness (27-cell coverage).

    Returns (index_into_sorted_arrays, squared_distance, found_mask); for
    not-found queries index is 0 and found is False.
    """
    n = grid.capacity
    m = query_points.shape[0]
    cell = jnp.floor(query_points / grid.cell_size).astype(jnp.int32)  # (M, 3)
    neigh = cell[:, None, :] + OFFSETS_27[None, :, :]                  # (M, 27, 3)
    keys = hash_coords(neigh)                                          # (M, 27)
    starts = jnp.searchsorted(grid.hashes_sorted, keys.reshape(-1), side="left")
    starts = starts.reshape(m, 27)

    best_d2 = jnp.full((m,), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((m,), jnp.int32)

    def body(b, carry):
        best_d2, best_idx = carry
        slot = jnp.clip(starts + b, 0, n - 1)                          # (M, 27)
        cand_hash = grid.hashes_sorted[slot]
        in_cell = cand_hash == keys
        cand_pts = grid.points_sorted[slot]                            # (M, 27, 3)
        d2 = jnp.sum((cand_pts - query_points[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(in_cell, d2, jnp.inf)
        j = jnp.argmin(d2, axis=-1)                                    # (M,)
        d2min = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
        idx = jnp.take_along_axis(slot, j[:, None], axis=-1)[:, 0]
        better = d2min < best_d2
        return jnp.where(better, d2min, best_d2), jnp.where(better, idx, best_idx)

    best_d2, best_idx = jax.lax.fori_loop(0, bucket_size, body, (best_d2, best_idx))
    max_dist = jnp.asarray(max_dist, jnp.float32)
    found = best_d2 <= max_dist * max_dist
    return best_idx, jnp.where(found, best_d2, jnp.inf), found


@partial(jax.jit, static_argnames=("bucket_size", "max_neighbors"))
def query_radius(grid: HashGrid, query_points: jnp.ndarray, radius,
                 bucket_size: int = 8, max_neighbors: int = 32
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Up to ``max_neighbors`` nearest grid points within ``radius``.

    Emulates Open3D's ``KDTreeSearchParamHybrid(radius, max_nn)`` used for
    normal estimation (``CloudRegistration.cpp:25-28``) and FPFH
    (``Submap.cpp:242-245``): gather all 27-cell candidates, keep the
    ``max_neighbors`` closest inside the radius.

    Returns (indices (M, K), sq_dists (M, K), valid (M, K)).
    """
    n = grid.capacity
    m = query_points.shape[0]
    cell = jnp.floor(query_points / grid.cell_size).astype(jnp.int32)
    neigh = cell[:, None, :] + OFFSETS_27[None, :, :]
    keys = hash_coords(neigh)
    starts = jnp.searchsorted(grid.hashes_sorted, keys.reshape(-1), side="left")
    starts = starts.reshape(m, 27)

    # Candidate slots: (M, 27 * bucket_size)
    b = jnp.arange(bucket_size, dtype=jnp.int32)
    slot = jnp.clip(starts[:, :, None] + b[None, None, :], 0, n - 1)
    slot = slot.reshape(m, -1)
    keys_rep = jnp.repeat(keys, bucket_size, axis=-1)
    in_cell = grid.hashes_sorted[slot] == keys_rep
    cand_pts = grid.points_sorted[slot]
    d2 = jnp.sum((cand_pts - query_points[:, None, :]) ** 2, axis=-1)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    valid = in_cell & (d2 <= r2)
    d2 = jnp.where(valid, d2, jnp.inf)
    # Top-K smallest distances.
    k = min(max_neighbors, d2.shape[-1])
    neg = -d2
    topv, topi = jax.lax.top_k(neg, k)
    sel_idx = jnp.take_along_axis(slot, topi, axis=-1)
    sel_d2 = -topv
    sel_valid = jnp.take_along_axis(valid, topi, axis=-1)
    return sel_idx, sel_d2, sel_valid
