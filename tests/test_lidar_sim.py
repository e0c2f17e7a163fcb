"""Tests for the spinning-beam LiDAR simulator + trajectory evaluation.

These validate the physics the SLAM pipeline depends on: exact occlusion,
beam-table geometry, rolling-shutter distortion consistent with the
constant-velocity undistortion model (``ops/motion_compensation.py``), and
the ATE/RPE metric implementations.
"""
import numpy as np
import pytest

from open3d_slam_tpu.io import lidar_sim as ls
from open3d_slam_tpu.utils import evaluation


class StaticTrajectory(ls.Trajectory):
    def __init__(self, T):
        self.T = np.asarray(T, np.float64)

    def poses(self, t):
        return np.tile(self.T, (len(np.asarray(t)), 1, 1))


NOISELESS = ls.BeamModel("test", ls._lin(-10.0, 10.0, 8), 720, 100.0, 0.3,
                         0.0, 0.0)


def test_occlusion_first_hit_only():
    # Box at x in [5,6] occludes a wall at x=10 for central azimuths.
    world = ls.PrimitiveWorld([
        ls.Box([5.0, -1.0, -2.0], [6.0, 1.0, 2.0]),
        ls.Box([10.0, -8.0, -2.0], [10.2, 8.0, 2.0]),
    ])
    T = np.eye(4)
    pts = ls.render_sweep(world, StaticTrajectory(T), 0.0, NOISELESS)
    az = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    r = np.linalg.norm(pts[:, :2], axis=1)
    center = np.abs(az) < 5.0
    assert center.any()
    # Everything in the occluded sector hits the NEAR box face (x ~= 5).
    assert np.all(pts[center, 0] < 6.5), "wall leaked through the box"
    assert np.allclose(pts[center, 0], 5.0, atol=0.05)
    # Outside the box's angular footprint the wall IS visible.
    side = (np.abs(az) > 15.0) & (np.abs(az) < 30.0)
    assert np.any(r[side] > 9.0)


def test_beam_table_elevations():
    world = ls.PrimitiveWorld([ls.Box([8.0, -50.0, -30.0], [8.5, 50.0, 30.0])])
    pts, t_off, ring = ls.render_sweep(
        world, StaticTrajectory(np.eye(4)), 0.0, NOISELESS, return_meta=True)
    elev = np.degrees(np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=1)))
    for j, e in enumerate(NOISELESS.elevations_deg):
        sel = ring == j
        assert sel.any()
        assert np.allclose(elev[sel], e, atol=1e-3)


def test_static_points_lie_on_surfaces():
    spec = ls.SimSequenceSpec(name="t", n_scans=10, seed=7)
    traj = ls._build_trajectory(spec)
    world = ls._build_world(spec, traj)
    T = traj.pose(0.0)
    pts = ls.render_sweep(world, StaticTrajectory(T), 0.0, NOISELESS)
    w = pts @ T[:3, :3].T.astype(np.float32) + T[:3, 3].astype(np.float32)
    d = world.surface_distance(w.astype(np.float64))
    assert d.mean() < 0.01 and np.percentile(d, 99) < 0.05


def test_rolling_shutter_and_undistortion():
    """A moving sensor produces a skewed raw cloud; constant-velocity
    undistortion (the reference's model) must restore world consistency."""
    import jax.numpy as jnp
    from open3d_slam_tpu.ops import motion_compensation as mc
    from open3d_slam_tpu.utils import pointcloud as pclib

    spec = ls.SimSequenceSpec(name="t", n_scans=10, seed=3)
    world = ls._build_world(spec, ls._build_trajectory(spec))
    traj = ls.StraightTrajectory(speed=8.0, z=1.2)   # fast: strong skew
    t0, dt = 1.0, 0.1
    raw = ls.render_sweep(world, traj, t0, NOISELESS, scan_duration=dt,
                          spin_clockwise=True)
    T = traj.pose(t0)

    def world_err(p):
        w = p @ T[:3, :3].T + T[:3, 3]
        return world.surface_distance(w.astype(np.float64)).mean()

    err_raw = world_err(raw)
    pc = pclib.from_numpy(raw, capacity=len(raw))
    out = mc.undistort_constant_velocity(
        pc, jnp.array([8.0, 0.0, 0.0]), jnp.zeros(3), dt,
        is_spinning_clockwise=True)
    fixed = np.asarray(out.points)[np.asarray(out.mask)]
    err_fixed = world_err(fixed)
    assert err_raw > 0.08           # mean skew is real (0.8 m shift at phase 1)
    assert err_fixed < err_raw / 4  # undistortion recovers it
    assert err_fixed < 0.05


def test_sequence_shapes_and_gt():
    spec = ls.SimSequenceSpec(name="t", sensor="vlp16", n_scans=5, seed=0)
    seq = ls.make_sim_sequence(spec)
    assert len(seq.scans) == 5 and len(seq.ground_truth) == 5
    for s in seq.scans:
        assert s.ndim == 2 and s.shape[1] == 3 and len(s) > 5000
    assert np.allclose(seq.ground_truth[0][:3, 3][2], 1.2, atol=0.2)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _traj(n=40, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    T = np.eye(4)
    for _ in range(n):
        d = np.eye(4)
        d[:3, 3] = [0.5, 0.02, 0.0]
        a = 0.05
        d[:3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                              [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        T = T @ d
        poses.append(T.copy())
    return poses


def test_ate_invariant_to_global_transform():
    gt = _traj()
    A = np.eye(4)
    ang = 0.7
    A[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    A[:3, 3] = [3.0, -2.0, 0.5]
    est = [A @ T for T in gt]
    res = evaluation.ate(gt, est, align=True)
    assert res.rmse < 1e-9
    # Without alignment the same offset is fully visible.
    assert evaluation.ate(gt, est, align=False).rmse > 1.0


def test_rpe_detects_local_noise():
    gt = _traj()
    rng = np.random.default_rng(1)
    est = []
    for T in gt:
        E = T.copy()
        E[:3, 3] += rng.normal(scale=0.05, size=3)
        est.append(E)
    clean = evaluation.rpe(gt, gt, delta=5)
    noisy = evaluation.rpe(gt, est, delta=5)
    assert clean.trans_rmse < 1e-12
    assert 0.02 < noisy.trans_rmse < 0.5
    assert noisy.drift_pct > 0


def test_associate_by_time():
    pairs = evaluation.associate([0.0, 0.1, 0.2], [0.001, 0.099, 0.35],
                                 max_dt=0.05)
    assert pairs == [(0, 0), (1, 1)]
