"""Parity bound for the approx-kNN hybrid-normals prepass.

The TPU normals path replaced XLA's exact TopK in ``kth_neighbor_d2`` with
``jax.lax.approx_min_k`` (recall 0.99) for a large preprocessing speedup.
These tests PIN the substitution's accuracy so a future recall regression
cannot silently degrade registration:

  * p99 angular deviation of hybrid-radius PCA normals (exact vs approx
    k-th neighbor distance) < 2 degrees on a realistic sim scan;
  * scan-to-scan point-to-plane registration with approx-normal targets
    lands within 1 cm / 0.1 deg of the exact-normal result.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.io import lidar_sim
from open3d_slam_tpu.ops import hashgrid, pallas_normals, registration as reg_ops
from open3d_slam_tpu.ops import normals as normals_ops
from open3d_slam_tpu.utils import pointcloud as pclib

K = 20
RADIUS = 3.0


def _sim_scan(seed, n=1024):
    spec = lidar_sim.SimSequenceSpec(
        name="parity", sensor="vlp16", world="yard", trajectory="circle",
        n_scans=8, seed=seed, world_kwargs=dict(extent=25.0, n_buildings=5),
        traj_kwargs=dict(radius=6.0))
    seq = lidar_sim.make_sim_sequence(spec)
    pts = seq.scans[5]
    sel = np.linspace(0, len(pts) - 1, n).astype(int)
    return pts[sel].astype(np.float32)


def _hybrid_normals(pts, exact):
    """Normals from per-point hybrid radius min(RADIUS, d_k), with the k-th
    distance from the exact or approx prepass — the flash path's semantics,
    evaluated via the probe path (CPU) at the per-point radius."""
    n = pts.shape[0]
    mask = jnp.ones(n, bool)
    dk2 = pallas_normals.kth_neighbor_d2(jnp.asarray(pts), mask, K,
                                         exact=exact)
    r_pp = np.asarray(pallas_normals.hybrid_radius(RADIUS, dk2))
    # brute-force PCA at each point's own radius (numpy reference engine)
    normals = np.zeros((n, 3), np.float32)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    for i in range(n):
        nb = pts[d2[i] <= r_pp[i] ** 2]
        if len(nb) < 3:
            normals[i] = [0, 0, 1]
            continue
        cov = np.cov(nb.T, bias=True)
        w, v = np.linalg.eigh(cov)
        normals[i] = v[:, 0]
    # orient towards origin (sensor)
    flip = (normals * pts).sum(1) > 0
    normals[flip] *= -1
    return normals


def test_normal_angle_deviation_bounded(rng):
    pts = _sim_scan(seed=3)
    n_exact = _hybrid_normals(pts, exact=True)
    n_approx = _hybrid_normals(pts, exact=False)
    dot = np.clip(np.abs((n_exact * n_approx).sum(1)), 0.0, 1.0)
    ang = np.degrees(np.arccos(dot))
    p99 = np.percentile(ang, 99)
    assert p99 < 2.0, f"p99 normal deviation {p99:.3f} deg"
    # and the typical point is bit-identical (missed k-th neighbors are rare)
    assert np.median(ang) < 1e-3


def test_registration_delta_bounded(rng):
    src_pts = _sim_scan(seed=3)
    # second scan: same world, slightly moved sensor
    tgt_pts = _sim_scan(seed=3, n=1024) + np.float32([0.08, -0.05, 0.01])

    def register(exact):
        tgt = pclib.from_numpy(tgt_pts, capacity=1024)
        nrm = _hybrid_normals(tgt_pts, exact=exact)
        tgt = tgt.with_(normals=jnp.asarray(nrm))
        grid = hashgrid.build(tgt, cell_size=1.0)
        res = reg_ops.icp_point_to_plane(
            pclib.from_numpy(src_pts, capacity=1024), grid, jnp.eye(4), 1.0,
            max_iterations=20, nn_method="probe")
        return np.asarray(res.transformation, np.float64)

    Te = register(True)
    Ta = register(False)
    dt = np.linalg.norm(Te[:3, 3] - Ta[:3, 3])
    dr = np.degrees(np.arccos(np.clip(
        (np.trace(Te[:3, :3].T @ Ta[:3, :3]) - 1) / 2, -1, 1)))
    assert dt < 0.01, f"translation delta {dt * 100:.2f} cm"
    assert dr < 0.1, f"rotation delta {dr:.4f} deg"
