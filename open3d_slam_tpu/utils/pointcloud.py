"""Padded, masked point-cloud pytree — the TPU-native replacement for
``open3d::geometry::PointCloud`` (reference ``typedefs.hpp:23``).

XLA requires static shapes, so every cloud is a fixed-capacity array plus a
validity mask.  All ops in ``open3d_slam_tpu.ops`` consume and produce this
structure; filtering (cropping, downsampling) toggles mask bits or compacts
via gather, it never changes array shapes inside jit.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity point cloud.

    Attributes:
      points:  (N, 3) float32; garbage beyond ``mask``.
      mask:    (N,) bool — True for valid points.
      normals: (N, 3) float32 or None.
      colors:  (N, 3) float32 or None.
    """

    points: jnp.ndarray
    mask: jnp.ndarray
    normals: Optional[jnp.ndarray] = None
    colors: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def has_normals(self) -> bool:
        return self.normals is not None

    def has_colors(self) -> bool:
        return self.colors is not None

    def with_(self, **kw) -> "PointCloud":
        return dataclasses.replace(self, **kw)

    def masked_points(self, fill: float = 1e9) -> jnp.ndarray:
        """Points with invalid entries pushed to a far sentinel so they never
        participate in neighbor queries."""
        return jnp.where(self.mask[:, None], self.points, fill)


def from_numpy(points: np.ndarray, capacity: Optional[int] = None,
               normals: Optional[np.ndarray] = None,
               colors: Optional[np.ndarray] = None) -> PointCloud:
    """Build a padded PointCloud from (n, 3) numpy points.

    ``capacity`` defaults to the next power of two >= n (stable jit shapes).
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if capacity is None:
        capacity = max(8, 1 << (n - 1).bit_length())
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    pad = capacity - n

    def _pad(a):
        if a is None:
            return None
        a = np.asarray(a, dtype=np.float32)
        return jnp.asarray(np.concatenate([a, np.zeros((pad, 3), np.float32)], axis=0))

    mask = jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]))
    return PointCloud(points=_pad(points), mask=mask, normals=_pad(normals), colors=_pad(colors))


def to_numpy(pc: PointCloud):
    """Extract valid points (and normals/colors) as numpy arrays."""
    mask = np.asarray(pc.mask)
    out = {"points": np.asarray(pc.points)[mask]}
    if pc.normals is not None:
        out["normals"] = np.asarray(pc.normals)[mask]
    if pc.colors is not None:
        out["colors"] = np.asarray(pc.colors)[mask]
    return out


def empty(capacity: int, with_normals: bool = False, with_colors: bool = False) -> PointCloud:
    z = jnp.zeros((capacity, 3), jnp.float32)
    return PointCloud(
        points=z,
        mask=jnp.zeros((capacity,), bool),
        normals=z if with_normals else None,
        colors=z if with_colors else None,
    )


def compact(pc: PointCloud) -> PointCloud:
    """Move all valid points to the front (stable order).  Shape-preserving."""
    order = jnp.argsort(~pc.mask, stable=True)

    def _take(a):
        return None if a is None else a[order]

    return PointCloud(
        points=_take(pc.points),
        mask=pc.mask[order],
        normals=_take(pc.normals),
        colors=_take(pc.colors),
    )


def padded_capacity(n: int, multiple: int = 256) -> int:
    """Smallest multiple of ``multiple`` >= n (static-shape capacity pick;
    256 is the largest fused-kernel query block, see pallas_icp.supports)."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def compact_to(pc: PointCloud, out_capacity: int) -> PointCloud:
    """Gather valid points into a NEW capacity, valid-first, stable order.

    One stable validity sort + small gathers.  (A sort is CHEAPER on TPU
    than the log-depth vectorized binary search this used to run: a 262k
    1-operand sort costs ~1.8 ms where a 65k-query ``searchsorted`` into a
    262k table costs ~5-15 ms of serial gather rounds.)  If the valid count
    exceeds ``out_capacity``, a UNIFORM STRIDE of the valid points is kept
    (spatially unbiased, same policy as voxel_downsample overflow) — callers
    should size capacity so this is rare.
    """
    n = pc.capacity
    order = jnp.argsort(jnp.where(pc.mask, jnp.int32(0), jnp.int32(1)),
                        stable=True)                       # valid-first
    total = jnp.sum(pc.mask.astype(jnp.int32))
    idx = jnp.arange(out_capacity, dtype=jnp.int32)
    stride = total.astype(jnp.float32) / jnp.float32(out_capacity)
    strided = jnp.floor(idx.astype(jnp.float32) * stride).astype(jnp.int32)
    want = jnp.where(total > out_capacity, strided, idx)
    pos = order[jnp.minimum(want, n - 1)]
    mask = idx < jnp.minimum(total, out_capacity)

    def take(a):
        return None if a is None else a[pos]

    return PointCloud(points=take(pc.points), mask=mask,
                      normals=take(pc.normals), colors=take(pc.colors))


def concat(a: PointCloud, b: PointCloud, capacity: int) -> PointCloud:
    """Concatenate two clouds into a new cloud of ``capacity``.

    Valid points of ``a`` come first, then valid points of ``b``.  Overflow
    beyond capacity keeps a uniform stride of the valid points (see
    ``compact_to``).  O(N) cumsum+gather — no argsort (an argsort of the
    combined capacity used to dominate the submap-insert program).
    """
    an, bn = a.capacity, b.capacity

    def _cat(x, y, fill=0.0):
        if x is None and y is None:
            return None
        if x is None:
            x = jnp.full((an, 3), fill, jnp.float32)
        if y is None:
            y = jnp.full((bn, 3), fill, jnp.float32)
        return jnp.concatenate([x, y], axis=0)

    big = PointCloud(points=_cat(a.points, b.points),
                     mask=jnp.concatenate([a.mask, b.mask]),
                     normals=_cat(a.normals, b.normals),
                     colors=_cat(a.colors, b.colors))
    return compact_to(big, capacity)
