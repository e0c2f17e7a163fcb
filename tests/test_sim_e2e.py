"""End-to-end SLAM on the realistic spinning-beam simulator (CPU-scaled).

Regression for the round-2 fitness-0.000 "dropouts": those were caused by
the default sim trajectory spreading a full revolution over ANY sequence
length, which made short bench renders a physically absurd 20+ m/s robot
(io/lidar_sim._build_trajectory now floors the default period at walking
speed).  This test replays a short vlp16 yard-circle spec — same sensor,
world and undistortion as the flagship ``vlp16_yard_circle`` benchmark, at
the same 3-ish m/s — through the full ``SlamWrapper`` and asserts:

  * ZERO odometry failures (every scan lands in the odometry pose buffer);
  * ZERO skipped scan2map refinements (every scan lands in the map buffer);
  * trajectory ATE within bound vs the simulator's ground truth.

The full 260-scan named sequences run on TPU via
``cli.mapping --sim <name> --eval-json`` (recorded in RESULTS.md).
"""
import numpy as np
import pytest

from open3d_slam_tpu.io import lidar_sim
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg, evaluation


@pytest.mark.slow
def test_vlp16_sim_short_sequence_no_dropouts():
    n_scans = 18
    spec = lidar_sim.SimSequenceSpec(
        name="e2e", sensor="vlp16", world="yard", trajectory="circle",
        n_scans=n_scans, seed=11,
        world_kwargs=dict(extent=30.0, n_buildings=6),
        traj_kwargs=dict(radius=10.0))
    seq = lidar_sim.make_sim_sequence(spec)

    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True
    # CPU-scaled capacities (same structure as the TPU run, smaller arrays).
    params.capacities = cfg.CapacityParameters(
        raw_scan=32768, processed_scan=8192, submap_points=32768,
        dense_submap_voxels=8192, map_patch=8192, feature_cloud=2048)
    params.mapper.is_attempt_loop_closures = False  # 18 scans: no closures
    slam = SlamWrapper(params)

    for scan, ts in zip(seq.scans, seq.timestamps):
        slam.process_scan(scan, ts)

    # No odometry failures: every scan's pose was pushed.
    assert len(slam.odometry.odom_buffer) == n_scans, \
        f"odometry dropped scans: {len(slam.odometry.odom_buffer)}/{n_scans}"
    # No skipped refinements: every scan's map pose was pushed.
    assert len(slam.mapper.map_to_range_sensor_buffer) == n_scans, \
        (f"scan2map skipped refinements: "
         f"{len(slam.mapper.map_to_range_sensor_buffer)}/{n_scans}")

    times, poses = slam.get_trajectory()
    ate_res, rpe_res = evaluation.evaluate_trajectory(
        seq.ground_truth, poses, gt_times=seq.timestamps, est_times=times,
        rpe_delta=5)
    assert ate_res.n >= n_scans - 1
    assert ate_res.rmse < 0.25, str(ate_res)
    assert rpe_res.drift_pct < 5.0, str(rpe_res)
