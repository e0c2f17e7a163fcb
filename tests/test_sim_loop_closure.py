"""Loop closure end-to-end on the realistic spinning-beam simulator.

The named TPU benchmark sequences close their loops at full length; this
is the CPU-scaled equivalent: a short closed circle on the SAME vlp16
spinning-beam sim (same sensor model, yard world, undistortion) with
``is_attempt_loop_closures = True``, asserting the full revisit chain
PlaceRecognition -> OptimizationProblem -> trajectory/submap rewrite runs
and the result stays consistent.  Match: the reference's revisit behavior
(``PlaceRecognition.cpp:50-176``) and update semantics
(``SlamWrapper.cpp:450-485``).
"""
import numpy as np
import pytest

from open3d_slam_tpu.io import lidar_sim
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg, evaluation


@pytest.mark.slow
def test_sim_loop_closure_fires_and_applies():
    n_scans = 46
    rate_hz = 5.0
    dur = n_scans / rate_hz
    spec = lidar_sim.SimSequenceSpec(
        name="e2e-lc", sensor="vlp16", world="yard", trajectory="circle",
        n_scans=n_scans, seed=7, rate_hz=rate_hz,
        world_kwargs=dict(extent=30.0, n_buildings=6),
        # 1.1 revolutions over the sequence (explicit period overrides the
        # default-speed floor) at ~3 m/s walking speed.
        traj_kwargs=dict(radius=4.0, period=dur / 1.1))
    seq = lidar_sim.make_sim_sequence(spec)

    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True
    params.capacities = cfg.CapacityParameters(
        raw_scan=32768, processed_scan=8192, submap_points=32768,
        dense_submap_voxels=8192, map_patch=8192, feature_cloud=8192)
    params.mapper.is_attempt_loop_closures = True
    # CPU-scaled gates: small submaps so several finish within 46 scans
    # (the deployed 20 m radius would keep the whole loop in one submap).
    params.mapper.submaps.radius = 2.5
    params.mapper.submaps.min_num_range_data = 3
    params.mapper.submaps.min_seconds_between_feature_computation = 0.0
    pr = params.mapper.place_recognition
    pr.loop_closure_search_radius = 12.0
    pr.min_submaps_between_loop_closures = 2
    pr.ransac_min_correspondence_set_size = 15
    pr.min_refinement_fitness = 0.4
    pr.feature_voxel_size = 0.5
    pr.max_icp_correspondence_distance = 0.6

    slam = SlamWrapper(params)
    for scan, ts in zip(seq.scans, seq.timestamps):
        slam.process_scan(scan, ts)
    slam.finish_processing()

    health = slam.get_health()
    assert health["n_submaps"] >= 4, health
    assert health["n_loop_closures_accepted"] >= 1, \
        f"no loop closure accepted on a closed loop: {health}"
    assert health["n_optimizations_applied"] >= 1, health
    # Applied graph: optimized node poses exist and constraints were zeroed
    # out after application (SlamWrapper.cpp:473-480 semantics).
    assert slam.optimization_problem.node_poses_optimized is not None
    for c in slam.optimization_problem.loop_closure_constraints:
        np.testing.assert_allclose(c.source_to_target, np.eye(4))

    # Trajectory stays consistent after the rewrite.
    times, poses = slam.get_trajectory()
    ate_res, rpe_res = evaluation.evaluate_trajectory(
        seq.ground_truth, poses, gt_times=seq.timestamps, est_times=times,
        rpe_delta=5)
    assert ate_res.rmse < 0.5, str(ate_res)
    assert rpe_res.drift_pct < 6.0, str(rpe_res)
