"""Cropping volumes: mask-based point filters applied at a pose.

Mirror of the reference's ``croppers.cpp`` (``src/croppers.cpp:23-242``):
MaxRadius / MinRadius / MinMaxRadius / Cylinder volumes.  The reference
erases points; here croppers return boolean masks over a fixed-capacity
cloud (combine with ``pc.mask``), keeping shapes static under jit.

A cropper's ``pose`` is the sensor pose; the volume is centered on the
pose translation (the reference applies ``setPose`` before cropping,
``croppers.cpp:76-106``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils.pointcloud import PointCloud

_BIG = 1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CroppingVolume:
    """Unified min/max radius + cylinder cropper.

    kind semantics (all reference types expressible):
      * MaxRadius:     min_radius=0,  max_radius=R
      * MinRadius:     min_radius=r,  max_radius=inf
      * MinMaxRadius:  min_radius=r,  max_radius=R
      * Cylinder:      cylinder=True, radius in xy, |z - z0| <= half_height
    """

    min_radius: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(0.0))
    max_radius: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(_BIG))
    cylinder_half_height: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(_BIG))
    is_cylinder: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def is_inside(self, points: jnp.ndarray, pose_translation: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Boolean mask of points inside the volume centered at the pose."""
        center = jnp.zeros((3,), points.dtype) if pose_translation is None else pose_translation
        d = points - center[None, :]
        if self.is_cylinder:
            r = jnp.linalg.norm(d[:, :2], axis=-1)
            ok_z = jnp.abs(d[:, 2]) <= self.cylinder_half_height
        else:
            r = jnp.linalg.norm(d, axis=-1)
            ok_z = True
        return (r >= self.min_radius) & (r <= self.max_radius) & ok_z

    def crop(self, pc: PointCloud, pose_translation: Optional[jnp.ndarray] = None) -> PointCloud:
        return pc.with_(mask=pc.mask & self.is_inside(pc.points, pose_translation))


def max_radius(radius) -> CroppingVolume:
    return CroppingVolume(max_radius=jnp.float32(radius))


def min_radius(radius) -> CroppingVolume:
    return CroppingVolume(min_radius=jnp.float32(radius))


def min_max_radius(rmin, rmax) -> CroppingVolume:
    return CroppingVolume(min_radius=jnp.float32(rmin), max_radius=jnp.float32(rmax))


def cylinder(radius, half_height=_BIG, min_r=0.0) -> CroppingVolume:
    return CroppingVolume(min_radius=jnp.float32(min_r), max_radius=jnp.float32(radius),
                          cylinder_half_height=jnp.float32(half_height), is_cylinder=True)


def from_params(cropper_name: str, cropping_radius_max, cropping_radius_min,
                cylinder_half_height=_BIG) -> CroppingVolume:
    """Factory mirroring ``croppers.cpp:23-47`` name dispatch."""
    name = cropper_name
    if name in ("MaxRadius",):
        return max_radius(cropping_radius_max)
    if name in ("MinRadius",):
        return min_radius(cropping_radius_min)
    if name in ("MinMaxRadius",):
        return min_max_radius(cropping_radius_min, cropping_radius_max)
    if name in ("Cylinder",):
        return cylinder(cropping_radius_max, cylinder_half_height, cropping_radius_min)
    raise ValueError(f"unknown cropper {name!r}")
