"""CLI end-to-end: mapping + localization entry points (small, CPU)."""
import os
import numpy as np
import pytest

from open3d_slam_tpu.cli import localization, mapping
from open3d_slam_tpu.io import datasets, pcd


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    seq = datasets.make_synthetic_sequence(
        n_scans=10, trajectory="straight", step=0.4, n_points=4000,
        max_range=22.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=22.0, n_ground=30000, n_walls=20000, n_pillars=10000))
    datasets.save_sequence(seq, str(d))
    return str(d)


def small_param_file(tmp_path):
    p = tmp_path / "small.yaml"
    p.write_text("""
capacities:
  raw_scan: 8192
  processed_scan: 4096
  submap_points: 32768
  dense_submap_voxels: 16384
  feature_cloud: 1024
odometry:
  scan_processing: {voxel_size: 0.4}
  scan_matcher:
    icp: {max_correspondence_distance: 1.0, max_num_iter: 12, knn: 10, max_distance_knn: 1.2}
mapper:
  scan_processing: {voxel_size: 0.4}
  scan_matcher:
    icp: {max_correspondence_distance: 1.0, max_num_iter: 12, knn: 10, max_distance_knn: 1.2}
  map_builder: {map_voxel_size: 0.4}
  is_build_dense_map: false
  is_attempt_loop_closures: false
""")
    return str(p)


def test_mapping_cli_end_to_end(seq_dir, tmp_path, capsys):
    rc = mapping.main([
        "--sequence", seq_dir, "--param", small_param_file(tmp_path),
        "--save-folder", str(tmp_path / "out"), "--save-map",
        "--no-skip-first"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ATE rmse" in out
    assert "realtime" in out
    map_path = tmp_path / "out" / "map.pcd"
    assert map_path.exists()
    data = pcd.read_pcd(str(map_path))
    assert data["points"].shape[0] > 500
    # ATE printed must be small
    import re
    m = re.search(r"ATE rmse ([0-9.]+) m", out)
    assert m and float(m.group(1)) < 0.2


def test_mapping_cli_requires_input(capsys):
    assert mapping.main([]) == 2


def test_localization_cli(seq_dir, tmp_path, capsys):
    # Build a map first.
    param = small_param_file(tmp_path)
    rc = mapping.main(["--sequence", seq_dir, "--param", param,
                       "--save-folder", str(tmp_path / "m"), "--save-map",
                       "--no-skip-first"])
    assert rc == 0
    rc = localization.main([
        "--map", str(tmp_path / "m" / "map.pcd"),
        "--sequence", seq_dir, "--param", param,
        "--initial-pose", "0", "0", "1.5", "0", "0", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded map" in out
    assert "pose xyz" in out


def test_localization_interactive_init_gate_relaxation(seq_dir, tmp_path, capsys):
    """SlamMapInitializer gate semantics (SlamMapInitializer.cpp:79-93):
    during the interactive window merging is off + the fitness gate is
    ignored; one scan after the window closes both are restored."""
    param = small_param_file(tmp_path)
    rc = mapping.main(["--sequence", seq_dir, "--param", param,
                       "--save-folder", str(tmp_path / "m2"), "--save-map",
                       "--no-skip-first"])
    assert rc == 0
    rc = localization.main([
        "--map", str(tmp_path / "m2" / "map.pcd"),
        "--sequence", seq_dir, "--param", param,
        "--initial-pose", "0", "0", "1.5", "0", "0", "0",
        "--interactive-init-scans", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Finished setting initial map!" in out


def test_map_initializer_unit():
    from open3d_slam_tpu.models.map_initializer import SlamMapInitializer
    from open3d_slam_tpu.utils import config as cfg

    class FakeSlam:
        def __init__(self):
            self.params = cfg.SlamParameters()
            self.params.mapper.is_merge_scans_into_map = True
        def set_initial_map(self, pts):
            self.map_set = pts.shape
        def set_initial_transform(self, T):
            self.T = np.asarray(T)

    slam = FakeSlam()
    ini = SlamMapInitializer(slam)
    ini.initialize(np.zeros((10, 3), np.float32), np.eye(4))
    assert slam.map_set == (10, 3)
    ini.begin_interactive_init()
    assert slam.params.mapper.is_merge_scans_into_map is False
    assert slam.params.mapper.is_ignore_min_refinement_fitness is True
    ini.update_pose(np.eye(4))
    ini.finish_initialization()
    assert slam.params.mapper.is_merge_scans_into_map is True   # restored now
    assert slam.params.mapper.is_ignore_min_refinement_fitness is True  # deferred
    ini.notify_scan_processed()
    assert slam.params.mapper.is_ignore_min_refinement_fitness is False


def test_mapping_cli_kitti(tmp_path, capsys):
    """--kitti replays a KITTI-format directory (synthetic .bin/times.txt/
    poses.txt round-trip) end-to-end through SlamWrapper — proves the
    real-data ingestion path works (examples.rst:7-36)."""
    seq = datasets.make_synthetic_sequence(
        n_scans=6, trajectory="straight", step=0.4, n_points=4000,
        max_range=22.0,
        world_cfg=datasets.SyntheticWorldConfig(
            extent=22.0, n_ground=30000, n_walls=20000, n_pillars=10000))
    folder = tmp_path / "kitti00"
    (folder / "velodyne").mkdir(parents=True)
    for i, s in enumerate(seq.scans):
        rec = np.concatenate(
            [s, np.zeros((s.shape[0], 1), np.float32)], axis=1)
        rec.astype(np.float32).tofile(str(folder / "velodyne" / f"{i:06d}.bin"))
    (folder / "times.txt").write_text(
        "\n".join(str(t) for t in seq.timestamps))
    (folder / "poses.txt").write_text(
        "\n".join(" ".join(str(v) for v in T[:3, :4].reshape(-1))
                  for T in seq.ground_truth))
    out = tmp_path / "eval.json"
    rc = mapping.main(["--kitti", str(folder),
                       "--param", small_param_file(tmp_path),
                       "--eval-json", str(out), "--no-skip-first"])
    assert rc == 0
    import json
    with open(out) as f:
        metrics = json.load(f)
    assert metrics["sequence"] == "kitti_kitti00"
    assert metrics["n_scans"] == 6
    assert metrics["ate_rmse_m"] < 1.0
