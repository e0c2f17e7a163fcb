"""Cropping volumes: mask-based point filters applied at a pose.

Mirror of the reference's ``croppers.cpp`` (``src/croppers.cpp:23-242``):
MaxRadius / MinRadius / MinMaxRadius / Cylinder volumes plus the
ColorRangeCropper.  The reference erases points; here croppers return
boolean masks over a fixed-capacity cloud (combine with ``pc.mask``),
keeping shapes static under jit.

A cropper's ``pose`` is the sensor pose; radius tests are centered on the
pose translation (the reference applies ``setPose`` before cropping,
``croppers.cpp:76-106``).  The Cylinder z test is ABSOLUTE in the cloud's
frame — ``p.z() >= minZ && p.z() <= maxZ`` (``croppers.cpp:163-165``) —
not relative to the pose.
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
      * Cylinder:      cylinder=True, radius in xy (relative to pose),
                       absolute z in [min_z, max_z]  (croppers.cpp:163-165)
    """

    min_radius: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(0.0))
    max_radius: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(_BIG))
    min_z: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(-_BIG))
    max_z: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(_BIG))
    is_cylinder: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def is_inside(self, points: jnp.ndarray, pose_translation: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Boolean mask of points inside the volume centered at the pose."""
        center = jnp.zeros((3,), points.dtype) if pose_translation is None else pose_translation
        d = points - center[None, :]
        if self.is_cylinder:
            r = jnp.linalg.norm(d[:, :2], axis=-1)
            # Absolute z bounds on the point itself (croppers.cpp:163-165).
            ok_z = (points[:, 2] >= self.min_z) & (points[:, 2] <= self.max_z)
        else:
            r = jnp.linalg.norm(d, axis=-1)
            ok_z = True
        return (r >= self.min_radius) & (r <= self.max_radius) & ok_z

    def crop(self, pc: PointCloud, pose_translation: Optional[jnp.ndarray] = None) -> PointCloud:
        return pc.with_(mask=pc.mask & self.is_inside(pc.points, pose_translation))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColorRangeCropper:
    """Keep points whose RGB lies inside [rgb_min, rgb_max] per channel
    (``croppers.cpp:176-242``).  Colorless clouds pass through unchanged,
    matching the reference's ``!cloud.HasColors()`` early-return."""

    rgb_min: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.zeros(3, jnp.float32))
    rgb_max: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.ones(3, jnp.float32))

    def is_valid_color(self, colors: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((colors >= self.rgb_min[None, :]) &
                       (colors <= self.rgb_max[None, :]), axis=-1)

    def crop(self, pc: PointCloud) -> PointCloud:
        if pc.colors is None:
            return pc
        return pc.with_(mask=pc.mask & self.is_valid_color(pc.colors))


def max_radius(radius) -> CroppingVolume:
    return CroppingVolume(max_radius=jnp.float32(radius))


def min_radius(radius) -> CroppingVolume:
    return CroppingVolume(min_radius=jnp.float32(radius))


def min_max_radius(rmin, rmax) -> CroppingVolume:
    return CroppingVolume(min_radius=jnp.float32(rmin), max_radius=jnp.float32(rmax))


def cylinder(radius, min_z=-_BIG, max_z=_BIG) -> CroppingVolume:
    """``CylinderCroppingVolume(radius, minZ, maxZ)`` (croppers.cpp:161)."""
    return CroppingVolume(max_radius=jnp.float32(radius),
                          min_z=jnp.float32(min_z), max_z=jnp.float32(max_z),
                          is_cylinder=True)


def from_params(cropper_name: str, cropping_radius_max, cropping_radius_min,
                cropping_min_z=-_BIG, cropping_max_z=_BIG) -> CroppingVolume:
    """Factory mirroring ``croppers.cpp:26-48`` name dispatch.

    Cylinder receives (maxRadius, minZ, maxZ), exactly the reference
    factory's argument wiring (croppers.cpp:29).
    """
    name = cropper_name
    if name in ("MaxRadius",):
        return max_radius(cropping_radius_max)
    if name in ("MinRadius",):
        return min_radius(cropping_radius_min)
    if name in ("MinMaxRadius",):
        return min_max_radius(cropping_radius_min, cropping_radius_max)
    if name in ("Cylinder",):
        return cylinder(cropping_radius_max, cropping_min_z, cropping_max_z)
    raise ValueError(f"unknown cropper {name!r}")


def from_cropper_params(c) -> CroppingVolume:
    """Build from a ``ScanCroppingParameters`` dataclass, wiring every field."""
    return from_params(c.cropper_name, c.cropping_max_radius, c.cropping_min_radius,
                       c.cropping_min_z, c.cropping_max_z)
