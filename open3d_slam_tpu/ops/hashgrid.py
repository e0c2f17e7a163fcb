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
import math
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


def query_nearest(grid: HashGrid, query_points: jnp.ndarray, max_dist,
                  bucket_size: int = 16, chunk: int = 8192,
                  method: str = "auto"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest valid grid point within ``max_dist`` of each query point.

    Returns (index_into_sorted_arrays, squared_distance, found_mask); for
    not-found queries index is 0 and found is False.

    Two implementations, selected at trace time (``method='auto'``):
      * ``bruteforce`` (TPU): exact NN on the MXU — flash-style ``lax.scan``
        over target chunks with the |q-t|^2 expansion (one (M,3)@(3,C)
        matmul per chunk) and a running argmin.  ~60x faster on TPU than any
        indexed probing (random gathers + searchsorted compositions lower
        poorly on TPU), and exact: the winner's distance is recomputed
        directly, so f32 cancellation can only swap equidistant ties.
      * ``probe`` (CPU): 27-cell hash-bucket probing (needs cell_size >=
        max_dist), which is O(M·27·B) instead of O(M·N).
    """
    m = query_points.shape[0]
    n = grid.capacity
    if method == "auto":
        if jax.default_backend() == "tpu":
            # Pallas flash-NN (validated exact on hardware, ~1.5x the XLA
            # brute force) when shapes tile; XLA brute-force otherwise.
            bm = min(256, m)
            bn = min(2048, n)
            method = ("pallas" if (m % bm == 0 and n % bn == 0 and m >= 8)
                      else "bruteforce")
        else:
            method = "probe"
    if method == "pallas":
        return _query_nearest_pallas(grid, query_points, max_dist)
    if method == "bruteforce":
        return _query_nearest_bruteforce(grid, query_points, max_dist, chunk=chunk)
    return _query_nearest_probe(grid, query_points, max_dist, bucket_size=bucket_size)


@jax.jit
def _query_nearest_pallas(grid: HashGrid, query_points: jnp.ndarray, max_dist):
    from open3d_slam_tpu.ops import pallas_knn
    m = query_points.shape[0]
    n = grid.capacity
    valid = grid.hashes_sorted != INT32_MAX
    t_t = grid.points_sorted.T                                  # (3, N)
    t2 = jnp.sum(grid.points_sorted * grid.points_sorted, axis=1)
    t2 = jnp.where(valid, t2, jnp.inf)[None, :]                 # (1, N)
    best_idx, _ = pallas_knn.nn_argmin(query_points, t_t, t2,
                                       block_m=min(256, m),
                                       block_n=min(2048, n))
    best_idx = jnp.clip(best_idx, 0, n - 1)
    best_pt = grid.points_sorted[best_idx]
    best_d2 = jnp.sum((best_pt - query_points) ** 2, axis=-1)
    max_dist = jnp.asarray(max_dist, jnp.float32)
    found = (best_d2 <= max_dist * max_dist) & valid[best_idx]
    return jnp.where(found, best_idx, 0), jnp.where(found, best_d2, jnp.inf), found


@partial(jax.jit, static_argnames=("chunk",))
def _query_nearest_bruteforce(grid: HashGrid, query_points: jnp.ndarray,
                              max_dist, chunk: int = 8192):
    n = grid.capacity
    m = query_points.shape[0]
    chunk = min(chunk, n)
    if n % chunk != 0:
        chunk = math.gcd(n, chunk)
    valid = grid.hashes_sorted != INT32_MAX
    q = query_points
    q2 = jnp.sum(q * q, axis=1)
    tgt_chunks = grid.points_sorted.reshape(n // chunk, chunk, 3)
    valid_chunks = valid.reshape(n // chunk, chunk)

    def body(carry, xs):
        best_d2, best_idx, off = carry
        t, vm = xs
        t2 = jnp.sum(t * t, axis=1)
        # HIGHEST precision: the MXU's default bf16 passes give |error| of
        # several units on |coords|~30 scenes, corrupting the argmin.
        dots = jnp.dot(q, t.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + t2[None, :] - 2.0 * dots
        d2 = jnp.where(vm[None, :], d2, jnp.inf)
        i = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]
        better = dmin < best_d2
        best_d2 = jnp.where(better, dmin, best_d2)
        best_idx = jnp.where(better, off + i.astype(jnp.int32), best_idx)
        return (best_d2, best_idx, off + chunk), None

    init = (jnp.full((m,), jnp.inf, jnp.float32), jnp.zeros((m,), jnp.int32),
            jnp.int32(0))
    (_, best_idx, _), _ = jax.lax.scan(body, init, (tgt_chunks, valid_chunks))
    # Exact distance of the selected neighbor (fixes f32 cancellation).
    best_pt = grid.points_sorted[best_idx]
    best_d2 = jnp.sum((best_pt - q) ** 2, axis=-1)
    best_valid = valid[best_idx]
    max_dist = jnp.asarray(max_dist, jnp.float32)
    found = (best_d2 <= max_dist * max_dist) & best_valid
    return jnp.where(found, best_idx, 0), jnp.where(found, best_d2, jnp.inf), found


@partial(jax.jit, static_argnames=("bucket_size",))
def _query_nearest_probe(grid: HashGrid, query_points: jnp.ndarray, max_dist,
                         bucket_size: int = 16):
    """27-cell sorted-hash probe; requires grid.cell_size >= max_dist."""
    n = grid.capacity
    m = query_points.shape[0]
    cell = jnp.floor(query_points / grid.cell_size).astype(jnp.int32)  # (M, 3)
    neigh = cell[:, None, :] + OFFSETS_27[None, :, :]                  # (M, 27, 3)
    keys = hash_coords(neigh)                                          # (M, 27)
    starts = jnp.searchsorted(grid.hashes_sorted, keys.reshape(-1), side="left")
    starts = starts.reshape(m, 27)
    b = jnp.arange(bucket_size, dtype=starts.dtype)
    slot = jnp.clip(starts[:, :, None] + b[None, None, :], 0, n - 1)   # (M, 27, B)
    slot = slot.reshape(m, -1)
    in_cell = grid.hashes_sorted[slot] == jnp.repeat(keys, bucket_size, axis=-1)
    cand_pts = grid.points_sorted[slot]
    d2 = jnp.sum((cand_pts - query_points[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(in_cell, d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
    best_idx = jnp.take_along_axis(slot, j[:, None], axis=-1)[:, 0].astype(jnp.int32)
    max_dist = jnp.asarray(max_dist, jnp.float32)
    found = best_d2 <= max_dist * max_dist
    return jnp.where(found, best_idx, 0), jnp.where(found, best_d2, jnp.inf), found


@partial(jax.jit, static_argnames=("max_neighbors", "chunk"))
def query_radius_bruteforce(grid: HashGrid, query_points: jnp.ndarray, radius,
                            max_neighbors: int = 32, chunk: int = 256
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EXACT hybrid radius+k search via a chunked MXU distance matrix.

    The probing ``query_radius`` scans only ``bucket_size`` entries per
    cell from the sorted-segment start; when cell_size == radius >> point
    spacing (FPFH: 2.5 m cells over a 0.5 m-voxel cloud, ~125 pts/cell) it
    truncates neighborhoods with a sorted-hash-position bias.  For the
    fixed-capacity feature clouds (<= 8k points) a (chunk, N) distance
    matrix + ``top_k`` is exact ``KDTreeSearchParamHybrid`` and MXU-fast.

    Returns (indices (M, K), sq_dists (M, K), valid (M, K)), nearest-first.
    """
    n = grid.capacity
    m = query_points.shape[0]
    chunk = min(chunk, m)
    if m % chunk != 0:
        chunk = math.gcd(m, chunk)
    k = min(max_neighbors, n)
    valid_t = grid.hashes_sorted != INT32_MAX
    t = grid.points_sorted
    t2 = jnp.where(valid_t, jnp.sum(t * t, axis=1), jnp.inf)
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    def body(_, q):
        q2 = jnp.sum(q * q, axis=1)
        dots = jnp.dot(q, t.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + t2[None, :] - 2.0 * dots           # (chunk, N)
        _, topi = jax.lax.top_k(-d2, k)
        # Exact distances of the winners (f32 cancellation guard).
        sel_pts = t[topi]
        sel_d2 = jnp.sum((sel_pts - q[:, None, :]) ** 2, axis=-1)
        sel_valid = (sel_d2 <= r2) & valid_t[topi]
        return None, (topi.astype(jnp.int32), sel_d2, sel_valid)

    qs = query_points.reshape(m // chunk, chunk, 3)
    _, (idx, d2, valid) = jax.lax.scan(body, None, qs)
    return (idx.reshape(m, k), d2.reshape(m, k), valid.reshape(m, k))


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
