"""Async driver + alternative registration types through the pipeline."""
import numpy as np
import pytest

from open3d_slam_tpu.io import datasets
from open3d_slam_tpu.models.async_driver import AsyncSlamDriver
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg


def small_params(reg_type="PointToPlaneIcp"):
    p = cfg.SlamParameters()
    p.capacities.raw_scan = 8192
    p.capacities.processed_scan = 4096
    p.capacities.submap_points = 32768
    p.capacities.dense_submap_voxels = 16384
    p.capacities.feature_cloud = 1024
    for o in (p.odometry, p.mapper):
        o.scan_processing.voxel_size = 0.4
        o.scan_matcher.icp.max_correspondence_distance = 1.0
        o.scan_matcher.icp.max_num_iter = 12
        o.scan_matcher.icp.max_distance_knn = 1.2
        o.scan_matcher.icp.knn = 10
    p.odometry.scan_matcher.reg_type = reg_type
    p.mapper.scan_matcher.scan_to_map_reg_type = reg_type
    p.mapper.map_builder.map_voxel_size = 0.4
    p.mapper.is_build_dense_map = False
    p.mapper.is_attempt_loop_closures = False
    return p


@pytest.fixture(scope="module")
def seq():
    return datasets.make_synthetic_sequence(
        n_scans=8, trajectory="straight", step=0.4, n_points=4000,
        max_range=22.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=22.0, n_ground=30000, n_walls=20000, n_pillars=10000))


def ate(gt, est):
    T0g, T0e = gt[0], est[0]
    return float(np.mean([
        np.linalg.norm((np.linalg.inv(T0g) @ g)[:3, 3] -
                       (np.linalg.inv(T0e) @ e)[:3, 3])
        for g, e in zip(gt, est)]))


def test_async_driver_matches_sync(seq):
    slam = SlamWrapper(small_params())
    with AsyncSlamDriver(slam) as driver:
        import time
        for scan, t in zip(seq.scans, seq.timestamps):
            while driver.is_backpressured():
                time.sleep(0.005)
            assert driver.add_range_scan(scan, t)
        # wait for drain
        for _ in range(2000):
            if len(slam.odometry_buffer) == 0 and len(slam.mapping_buffer) == 0:
                break
            time.sleep(0.01)
    times, poses = slam.get_trajectory()
    assert len(poses) == len(seq.scans)
    err = ate(seq.ground_truth, poses)
    assert err < 0.1, err


@pytest.mark.parametrize("reg_type", ["PointToPointIcp", "GeneralizedIcp"])
def test_pipeline_with_other_registration_types(seq, reg_type):
    slam = SlamWrapper(small_params(reg_type))
    est = []
    for scan, t in zip(seq.scans[:6], seq.timestamps[:6]):
        assert slam.process_scan(scan, t)
        est.append(slam.mapper.map_to_range_sensor.copy())
    err = ate(seq.ground_truth[:6], est)
    assert err < 0.25, f"{reg_type} ATE {err}"
