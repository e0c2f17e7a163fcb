"""SE(3) / SO(3) utilities for TPU-native SLAM.

The reference represents poses as ``Eigen::Isometry3d`` (``Transform.hpp:13`` in
/root/reference) and interpolates with quaternion slerp
(``src/Transform.cpp:16-41``).  Here poses are 4x4 float32 matrices (jnp arrays)
and small pose updates use the SE(3) exponential map so that the Gauss-Newton
ICP solver can retract 6-vector increments on-device, batched with vmap.

All functions are jit/vmap friendly: static shapes, no Python branching on
traced values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (batched over leading dims)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, numerically safe near ||w|| = 0."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    # Taylor fallback for tiny angles.
    small = theta2[..., 0, 0] < 1e-8
    a = jnp.where(small[..., None, None], 1.0 - theta2 / 6.0, a)
    b = jnp.where(small[..., None, None], 0.5 - theta2 / 24.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of a rotation matrix -> axis-angle 3-vector."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_hat = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        theta[..., None] < 1e-5,
        1.0 + theta[..., None] ** 2 / 6.0,
        theta[..., None] / jnp.where(jnp.abs(sin_theta[..., None]) < _EPS, _EPS, sin_theta[..., None]),
    )
    # Near theta = pi the formula above is ill-conditioned; fall back to the
    # diagonal-based extraction.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis2)
    # Fix signs from off-diagonal terms.
    sign = jnp.stack(
        [
            jnp.sign(R[..., 2, 1] - R[..., 1, 2] + _EPS),
            jnp.sign(R[..., 0, 2] - R[..., 2, 0] + _EPS),
            jnp.sign(R[..., 1, 0] - R[..., 0, 1] + _EPS),
        ],
        axis=-1,
    )
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_hat * scale)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential.  xi = (omega, v) -> 4x4 homogeneous transform.

    Convention: xi[..., :3] is rotation (axis-angle), xi[..., 3:] translation.
    Matches the update convention of the point-to-plane GN solver in
    ops/registration.py.
    """
    w = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    R = so3_exp(w)
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    c = (theta - jnp.sin(theta)) / (theta2.clip(_EPS) * theta)
    small = theta2[..., 0, 0] < 1e-8
    b = jnp.where(small[..., None, None], 0.5 - theta2 / 24.0, b)
    c = jnp.where(small[..., None, None], 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return make_transform(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map -> (omega, v) 6-vector."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
    cot_term = 1.0 / theta2.clip(_EPS) * (
        1.0 - (theta * jnp.sin(theta)) / (2.0 * (1.0 - jnp.cos(theta))).clip(_EPS)
    )
    small = theta2[..., 0, 0] < 1e-8
    cot_term = jnp.where(small[..., None, None], 1.0 / 12.0 + theta2 / 720.0, cot_term)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot_term * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 transform(s) from rotation + translation."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    # NOTE: full-f32 matmul precision is required (bf16 MXU rounding moves
    # points by ~1e-2 m at |p|~30 m); enforced package-wide in __init__.
    """Apply 4x4 transform to (N, 3) points (leading batch dims on T allowed)."""
    return pts @ T[..., :3, :3].swapaxes(-1, -2) + T[..., None, :3, 3]


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Rotate (N, 3) direction vectors (normals) by the rotation part of T."""
    return vecs @ T[..., :3, :3].swapaxes(-1, -2)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.swapaxes(-1, -2)
    return make_transform(Rt, -(Rt @ t[..., None])[..., 0])


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per Shepperd branch.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 branches, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    # Canonical sign: w >= 0.
    return q * jnp.sign(q[..., :1] + _EPS)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Quaternion slerp; mirrors Eigen's ``Quaterniond::slerp`` used by the
    reference's pose interpolation (``src/Transform.cpp:16-41``)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, alpha, jnp.sin(alpha * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def interpolate(T0: jnp.ndarray, T1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Pose interpolation: lerp translation + slerp rotation.

    Mirrors the reference's ``interpolate`` (``src/Transform.cpp:16-41``).
    """
    alpha = jnp.asarray(alpha)
    t = (1.0 - alpha[..., None]) * T0[..., :3, 3] + alpha[..., None] * T1[..., :3, 3]
    q0 = quat_from_matrix(T0[..., :3, :3])
    q1 = quat_from_matrix(T1[..., :3, :3])
    R = matrix_from_quat(slerp(q0, q1, alpha[..., None]))
    return make_transform(R, t)


def rpy_to_matrix(roll, pitch, yaw) -> jnp.ndarray:
    """Roll/pitch/yaw -> rotation matrix; matches the reference's
    ``fromRPY`` convention (Rz * Ry * Rx, ``src/math.cpp``)."""
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    Rz = jnp.stack([
        jnp.stack([cy, -sy, jnp.zeros_like(cy)], -1),
        jnp.stack([sy, cy, jnp.zeros_like(cy)], -1),
        jnp.stack([jnp.zeros_like(cy), jnp.zeros_like(cy), jnp.ones_like(cy)], -1)], -2)
    Ry = jnp.stack([
        jnp.stack([cp, jnp.zeros_like(cp), sp], -1),
        jnp.stack([jnp.zeros_like(cp), jnp.ones_like(cp), jnp.zeros_like(cp)], -1),
        jnp.stack([-sp, jnp.zeros_like(cp), cp], -1)], -2)
    Rx = jnp.stack([
        jnp.stack([jnp.ones_like(cr), jnp.zeros_like(cr), jnp.zeros_like(cr)], -1),
        jnp.stack([jnp.zeros_like(cr), cr, -sr], -1),
        jnp.stack([jnp.zeros_like(cr), sr, cr], -1)], -2)
    return Rz @ Ry @ Rx


def matrix_to_rpy(R: jnp.ndarray):
    """Rotation matrix -> (roll, pitch, yaw); inverse of rpy_to_matrix."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw
