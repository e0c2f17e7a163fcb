"""End-to-end SlamWrapper runs: full pipeline, loop closure, saving."""
import os
import numpy as np
import pytest

from open3d_slam_tpu.io import datasets, pcd
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg


def wrapper_params(**kw):
    p = cfg.SlamParameters()
    p.capacities.raw_scan = 8192
    p.capacities.processed_scan = 8192
    p.capacities.submap_points = 65536
    p.capacities.dense_submap_voxels = 32768
    p.capacities.feature_cloud = 2048
    for o in (p.odometry, p.mapper):
        o.scan_processing.voxel_size = 0.4
        o.scan_matcher.icp.max_correspondence_distance = 1.0
        o.scan_matcher.icp.max_num_iter = 15
        o.scan_matcher.icp.max_distance_knn = 1.2
        o.scan_matcher.icp.knn = 12
    p.mapper.map_builder.map_voxel_size = 0.4
    p.mapper.map_builder.cropper.cropping_max_radius = 35.0
    p.mapper.map_builder.carving.carve_space_every_n_scans = 8
    p.mapper.is_build_dense_map = False
    p.mapper.is_attempt_loop_closures = False
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def ate(gt_poses, est_poses):
    T0_gt, T0_est = gt_poses[0], est_poses[0]
    errs = [np.linalg.norm((np.linalg.inv(T0_gt) @ Tg)[:3, 3] -
                           (np.linalg.inv(T0_est) @ Te)[:3, 3])
            for Tg, Te in zip(gt_poses, est_poses)]
    return float(np.mean(errs))


def test_wrapper_end_to_end_straight(tmp_path):
    seq = datasets.make_synthetic_sequence(
        n_scans=10, trajectory="straight", step=0.5, n_points=6000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=25.0, n_ground=40000, n_walls=30000, n_pillars=15000))
    slam = SlamWrapper(wrapper_params())
    est = []
    for scan, t in zip(seq.scans, seq.timestamps):
        assert slam.process_scan(scan, t)
        est.append(slam.mapper.map_to_range_sensor.copy())
    err = ate(seq.ground_truth, est)
    assert err < 0.1, f"e2e ATE {err}"

    # Save the map and read it back.
    slam.folder_path = str(tmp_path)
    path = slam.save_map()
    data = pcd.read_pcd(path)
    assert data["points"].shape[0] > 1000
    assert "normals" in data

    # Trajectory accessor.
    times, poses = slam.get_trajectory()
    assert len(times) == len(seq.scans)


def test_wrapper_out_of_order_rejection():
    slam = SlamWrapper(wrapper_params())
    pts = np.random.default_rng(0).uniform(-10, 10, (1000, 3)).astype(np.float32)
    assert slam.add_range_scan(pts, 1.0)
    assert not slam.add_range_scan(pts, 0.5)  # out of order -> dropped


def test_wrapper_nan_removal():
    slam = SlamWrapper(wrapper_params())
    pts = np.random.default_rng(0).uniform(-10, 10, (100, 3)).astype(np.float32)
    pts[10] = np.nan
    pts[20, 2] = np.inf
    assert slam.add_range_scan(pts, 0.0)
    m = slam.odometry_buffer.peek_back()
    assert int(m.cloud.count()) == 98


@pytest.mark.slow
def test_wrapper_loop_closure_fires():
    """Drive a loop; a loop-closure constraint must be found and applied."""
    seq = datasets.make_synthetic_sequence(
        n_scans=42, trajectory="circle", radius=11.0, n_points=6000,
        max_range=22.0, angle_total=2 * np.pi * 1.05,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=28.0, n_ground=60000, n_walls=40000, n_pillars=30000,
            n_pillar_count=30))
    p = wrapper_params()
    p.mapper.is_attempt_loop_closures = True
    # Feature clouds must not saturate: a truncated 0.5 m-voxel cloud starves
    # FPFH matching (these submaps have ~4-6k feature voxels).
    p.capacities.feature_cloud = 8192
    p.mapper.submaps.radius = 5.0
    p.mapper.submaps.min_num_range_data = 3
    p.mapper.submaps.min_seconds_between_feature_computation = 0.0
    pr = p.mapper.place_recognition
    pr.loop_closure_search_radius = 12.0
    pr.min_submaps_between_loop_closures = 2
    pr.ransac_min_correspondence_set_size = 15
    pr.min_refinement_fitness = 0.4
    pr.feature_voxel_size = 0.5
    pr.max_icp_correspondence_distance = 0.6

    slam = SlamWrapper(p)
    for scan, t in zip(seq.scans, seq.timestamps):
        slam.process_scan(scan, t)
    slam.finish_processing()

    assert slam.submaps.get_num_submaps() >= 5
    # At least one loop-closure constraint accepted over the run.
    assert len(slam.optimization_problem.loop_closure_constraints) >= 1, \
        "no loop closure found on a closed loop"
    # Pose graph was optimized and applied.
    assert slam.optimization_problem.node_poses_optimized is not None


def test_finish_processing_empty_scan_no_duplicates():
    """forceNewSubmapCreation must insert an EMPTY cloud
    (SubmapCollection.cpp:163-170): the finished submap's content must not
    grow, and it must reach the finished/feature queue."""
    seq = datasets.make_synthetic_sequence(
        n_scans=6, trajectory="straight", step=0.5, n_points=5000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=25.0, n_ground=30000, n_walls=20000, n_pillars=10000))
    p = wrapper_params()
    p.mapper.is_attempt_loop_closures = True  # exercise the feature queue
    slam = SlamWrapper(p)
    for scan, t in zip(seq.scans, seq.timestamps):
        slam.process_scan(scan, t)
    sc = slam.submaps
    active_before = sc.active_submap_idx
    pts_before = int(sc.get_submap(active_before).map_cloud.count())
    scans_before = sc.get_submap(active_before).n_scans_inserted_map
    slam.finish_processing()
    finished = sc.get_submap(active_before)
    # Exactly one (empty) insertion ran on the finished submap...
    assert finished.n_scans_inserted_map == scans_before + 1
    # ...and no content was added (revoxelization may merge a few points,
    # but duplicating a scan would ADD hundreds).
    pts_after = int(finished.map_cloud.count())
    assert pts_after <= pts_before, (pts_before, pts_after)
    # The finished submap entered the feature pipeline (features computed).
    assert finished.fpfh is not None
    # A new active submap exists and the switch was recorded.
    assert sc.active_submap_idx != active_before
    assert sc.get_num_submaps() >= 2


def test_finish_processing_with_empty_overlap_buffer():
    """finishProcessing must work when the overlap buffer is empty (the
    old implementation silently no-oped)."""
    seq = datasets.make_synthetic_sequence(
        n_scans=2, trajectory="straight", step=0.5, n_points=4000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=25.0, n_ground=30000, n_walls=20000, n_pillars=10000))
    slam = SlamWrapper(wrapper_params())
    for scan, t in zip(seq.scans, seq.timestamps):
        slam.process_scan(scan, t)
    slam.submaps.overlap_scans_buffer.clear()
    n_before = slam.submaps.get_num_submaps()
    slam.finish_processing()  # must not raise and must finish the submap
    assert slam.submaps.get_num_submaps() == n_before + 1


def test_colored_scans_reach_dense_map():
    """Colors ingested via add_range_scan flow through undistortion/cropping
    into the dense map's per-voxel color means (Voxel.cpp:33-36 analog)."""
    seq = datasets.make_synthetic_sequence(
        n_scans=3, trajectory="straight", step=0.5, n_points=4000,
        max_range=25.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=25.0, n_ground=30000, n_walls=20000, n_pillars=10000))
    p = wrapper_params()
    p.mapper.is_build_dense_map = True
    slam = SlamWrapper(p)
    for scan, t in zip(seq.scans, seq.timestamps):
        # Height-coded colors: red channel = normalized z.
        z = scan[:, 2]
        r = (z - z.min()) / max(float(np.ptp(z)), 1e-6)
        colors = np.stack([r, 0.5 * np.ones_like(r), 1.0 - r], axis=1)
        slam.process_scan(scan, t, colors=colors.astype(np.float32))
    dense = slam.get_dense_map_cloud()
    assert "colors" in dense and dense["colors"].shape == dense["points"].shape
    # Colors are real data, not zeros: mid-channel mean ~0.5, red varies.
    assert abs(float(dense["colors"][:, 1].mean()) - 0.5) < 0.05
    assert float(dense["colors"][:, 0].std()) > 0.05
