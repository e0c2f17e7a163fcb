import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from open3d_slam_tpu.utils import se3


def random_rotvecs(rng, n, scale=1.0):
    return rng.normal(size=(n, 3)) * scale


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 32).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = random_rotvecs(rng, 32, scale=0.8).astype(np.float32)
    w2 = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_small_angle():
    w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_inverse(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    TT = np.asarray(T @ se3.inverse(T))
    np.testing.assert_allclose(TT, np.eye(4)[None].repeat(8, 0), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 64).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    q = se3.quat_from_matrix(R)
    R2 = se3.matrix_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # Match scipy's quaternion up to sign (scipy is x,y,z,w).
    q_ref = Rotation.from_matrix(np.asarray(R)).as_quat()  # (x, y, z, w)
    q_np = np.asarray(q)
    for i in range(64):
        a = q_np[i]
        b = np.array([q_ref[i][3], *q_ref[i][:3]])
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-4


def test_slerp_interpolation_matches_scipy(rng):
    from scipy.spatial.transform import Slerp
    w0 = random_rotvecs(rng, 1)[0]
    w1 = random_rotvecs(rng, 1)[0]
    R0 = Rotation.from_rotvec(w0)
    R1 = Rotation.from_rotvec(w1)
    T0 = np.eye(4); T0[:3, :3] = R0.as_matrix(); T0[:3, 3] = [1, 2, 3]
    T1 = np.eye(4); T1[:3, :3] = R1.as_matrix(); T1[:3, 3] = [4, 5, 6]
    for alpha in [0.0, 0.25, 0.5, 0.75, 1.0]:
        Ti = np.asarray(se3.interpolate(jnp.asarray(T0, jnp.float32),
                                        jnp.asarray(T1, jnp.float32), alpha))
        s = Slerp([0, 1], Rotation.concatenate([R0, R1]))
        R_ref = s(alpha).as_matrix()
        t_ref = (1 - alpha) * T0[:3, 3] + alpha * T1[:3, 3]
        np.testing.assert_allclose(Ti[:3, :3], R_ref, atol=1e-5)
        np.testing.assert_allclose(Ti[:3, 3], t_ref, atol=1e-5)


def test_rpy_roundtrip(rng):
    roll, pitch, yaw = 0.3, -0.4, 1.2
    R = se3.rpy_to_matrix(roll, pitch, yaw)
    r2, p2, y2 = se3.matrix_to_rpy(R)
    np.testing.assert_allclose([float(r2), float(p2), float(y2)], [roll, pitch, yaw], atol=1e-5)
    R_ref = Rotation.from_euler("ZYX", [yaw, pitch, roll]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-6)
