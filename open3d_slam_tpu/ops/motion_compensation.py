"""Constant-velocity scan undistortion.

Mirror of the reference's ``ConstantVelocityMotionCompensation``
(``src/MotionCompensation.cpp:32-139``):
  * lin/ang velocity estimated from the pose buffer over the last
    ``num_poses_velocity_estimation`` poses (host side, see models/buffers);
  * per-point azimuth spin phase in [0, 1] (CW/CCW aware,
    ``computePhase``, ``MotionCompensation.cpp:120-139``);
  * per-point correction ``motion(phase) * p`` with
    xyz = phase * scan_duration * v,  rpy = phase * scan_duration * w.

Vectorized over all points on device; the base-class no-op is just not
calling this.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.pointcloud import PointCloud


def compute_phase(points: jnp.ndarray, is_spinning_clockwise: bool) -> jnp.ndarray:
    """Azimuth spin phase in [0, 1] per point (``computePhase`` semantics)."""
    angle = jnp.arctan2(points[:, 1], points[:, 0])
    wrapped = jnp.where(angle < 0.0, angle + 2.0 * jnp.pi, angle)
    phase = wrapped / (2.0 * jnp.pi)
    if is_spinning_clockwise:
        phase = jnp.where(wrapped == 0.0, 0.0, 1.0 - phase)
    return phase


@partial(jax.jit, static_argnames=("is_spinning_clockwise",))
def undistort_constant_velocity(pc: PointCloud,
                                linear_velocity: jnp.ndarray,
                                angular_velocity_rpy: jnp.ndarray,
                                scan_duration,
                                is_spinning_clockwise: bool = True) -> PointCloud:
    """Apply per-point constant-velocity correction.

    ``p_out = R_rpy(phase * dt * w) p + phase * dt * v`` — exactly the
    reference's ``motion * p`` with motion = makeTransform(xyz, fromRPY(rpy)).
    """
    dt = jnp.asarray(scan_duration, jnp.float32)
    phase = compute_phase(pc.points, is_spinning_clockwise)  # (N,)
    xyz = phase[:, None] * dt * linear_velocity[None, :]
    rpy = phase[:, None] * dt * angular_velocity_rpy[None, :]
    R = se3.rpy_to_matrix(rpy[:, 0], rpy[:, 1], rpy[:, 2])   # (N, 3, 3)
    pts = jnp.einsum("nij,nj->ni", R, pc.points) + xyz
    return pc.with_(points=pts)


@jax.jit
def estimate_velocities(T_start: jnp.ndarray, T_finish: jnp.ndarray, dt):
    """Velocities from two poses: dT = T_start^-1 T_finish.

    Mirrors ``estimateLinearAndAngularVelocity``
    (``MotionCompensation.cpp:32-57``): linear = dT.t / dt, angular =
    RPY(dT.R) / dt.  Jitted: ~15 eager op dispatches otherwise, twice per
    scan, each paying tunnel dispatch latency.
    """
    dt = jnp.asarray(dt, jnp.float32)
    dT = se3.inverse(T_start) @ T_finish
    lin = dT[:3, 3] / (dt + 1e-6)
    r, p, y = se3.matrix_to_rpy(dT[:3, :3])
    ang = jnp.stack([r, p, y]) / (dt + 1e-6)
    return lin, ang
