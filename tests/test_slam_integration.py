"""Integration: odometry + mapper over synthetic sequences (CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from open3d_slam_tpu.io import datasets
from open3d_slam_tpu.models.buffers import TransformInterpolationBuffer
from open3d_slam_tpu.models.mapper import Mapper
from open3d_slam_tpu.models.odometry import LidarOdometry
from open3d_slam_tpu.models.submap_collection import SubmapCollection
from open3d_slam_tpu.utils import config as cfg, pointcloud as pclib


def small_params():
    p = cfg.SlamParameters()
    p.odometry.scan_processing.voxel_size = 0.4
    p.odometry.scan_matcher.icp.max_correspondence_distance = 1.0
    p.odometry.scan_matcher.icp.max_num_iter = 20
    p.odometry.scan_matcher.icp.max_distance_knn = 1.2
    p.odometry.scan_matcher.icp.knn = 12
    p.mapper.scan_processing.voxel_size = 0.4
    p.mapper.scan_processing.cropper.cropping_max_radius = 25.0
    p.mapper.scan_matcher.icp.max_correspondence_distance = 1.0
    p.mapper.scan_matcher.icp.max_num_iter = 20
    p.mapper.scan_matcher.icp.max_distance_knn = 1.2
    p.mapper.scan_matcher.icp.knn = 12
    p.mapper.map_builder.map_voxel_size = 0.4
    p.mapper.map_builder.cropper.cropping_max_radius = 35.0
    p.mapper.map_builder.carving.carve_space_every_n_scans = 5
    p.mapper.is_build_dense_map = False
    return p


def ate(gt_poses, est_poses):
    """Translation ATE after aligning first poses."""
    T0_gt, T0_est = gt_poses[0], est_poses[0]
    errs = []
    for Tg, Te in zip(gt_poses, est_poses):
        rel_g = np.linalg.inv(T0_gt) @ Tg
        rel_e = np.linalg.inv(T0_est) @ Te
        errs.append(np.linalg.norm(rel_g[:3, 3] - rel_e[:3, 3]))
    return float(np.mean(errs))


@pytest.fixture(scope="module")
def seq():
    return datasets.make_synthetic_sequence(
        n_scans=12, trajectory="straight", step=0.4, n_points=6000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=25.0, n_ground=40000, n_walls=30000, n_pillars=20000))


def test_odometry_tracks_straight_line(seq):
    p = small_params()
    odo = LidarOdometry(p.odometry, processed_capacity=8192)
    est = []
    for scan, t in zip(seq.scans, seq.timestamps):
        pc = pclib.from_numpy(scan, capacity=8192)
        ok = odo.add_range_scan(pc, t)
        assert ok
        est.append(odo.odom_to_range_sensor_cumulative.copy())
    err = ate(seq.ground_truth, est)
    assert err < 0.15, f"odometry ATE too high: {err}"


def test_mapper_scan_to_map(seq):
    p = small_params()
    odo = LidarOdometry(p.odometry, processed_capacity=8192)
    submaps = SubmapCollection(p.mapper, map_capacity=65536,
                               dense_capacity=16384, feature_capacity=2048)
    mapper = Mapper(p.mapper, odo.odom_buffer, submaps,
                    processed_capacity=8192)
    est = []
    for scan, t in zip(seq.scans, seq.timestamps):
        pc = pclib.from_numpy(scan, capacity=8192)
        assert odo.add_range_scan(pc, t)
        mapper.set_map_to_range_sensor(mapper.map_to_range_sensor)
        ok = mapper.add_range_measurement(pc, t)
        assert ok, f"mapper failed at t={t}"
        est.append(mapper.map_to_range_sensor.copy())
    err = ate(seq.ground_truth, est)
    assert err < 0.1, f"mapper ATE too high: {err}"
    # Map grew.
    assert submaps.get_total_num_points() > 1000


def test_submap_switching():
    """A long trajectory must spawn multiple submaps and chain adjacency."""
    seq = datasets.make_synthetic_sequence(
        n_scans=20, trajectory="straight", step=1.2, n_points=5000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=30.0, n_ground=50000, n_walls=30000, n_pillars=20000))
    p = small_params()
    p.mapper.submaps.radius = 6.0
    p.mapper.submaps.min_num_range_data = 3
    odo = LidarOdometry(p.odometry, processed_capacity=8192)
    submaps = SubmapCollection(p.mapper, map_capacity=65536,
                               dense_capacity=16384, feature_capacity=2048)
    mapper = Mapper(p.mapper, odo.odom_buffer, submaps, processed_capacity=8192)
    for scan, t in zip(seq.scans, seq.timestamps):
        pc = pclib.from_numpy(scan, capacity=8192)
        odo.add_range_scan(pc, t)
        mapper.add_range_measurement(pc, t)
    assert submaps.get_num_submaps() >= 2
    assert len(submaps.finished_submaps_idxs) >= 1
    # Adjacency chain exists between consecutive submaps.
    assert submaps.adjacency.is_adjacent(0, 1)
