"""PCD IO (python + native C++), dataset replay, native sequence reader."""
import os
import numpy as np
import pytest

from open3d_slam_tpu.io import datasets, native, pcd


def test_pcd_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    path = str(tmp_path / "a.pcd")
    pcd.write_pcd(path, pts, normals=nrm)
    out = pcd.read_pcd(path)
    np.testing.assert_allclose(out["points"], pts, atol=1e-6)
    np.testing.assert_allclose(out["normals"], nrm, atol=1e-6)


def test_pcd_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "a_ascii.pcd")
    pcd.write_pcd(path, pts, binary=False)
    out = pcd.read_pcd(path)
    np.testing.assert_allclose(out["points"], pts, atol=1e-5)


def test_pcd_roundtrip_colors(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.uniform(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "c.pcd")
    pcd.write_pcd(path, pts, colors=col)
    out = pcd.read_pcd(path)
    np.testing.assert_allclose(out["points"], pts, atol=1e-6)
    np.testing.assert_allclose(out["colors"], col, atol=1.0 / 255 + 1e-6)


def test_native_pcd_matches_python(tmp_path, rng):
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    nrm = rng.normal(size=(1000, 3)).astype(np.float32)
    path = str(tmp_path / "n.pcd")
    assert native.write_pcd_native(path, pts, normals=nrm)
    out = native.read_pcd_native(path)
    np.testing.assert_allclose(out["points"], pts, atol=1e-6)
    np.testing.assert_allclose(out["normals"], nrm, atol=1e-6)


def test_native_sequence_reader(tmp_path, rng):
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    folder = str(tmp_path / "scans")
    os.makedirs(folder)
    scans = [rng.normal(size=(100 + i, 3)).astype(np.float32) for i in range(5)]
    for i, s in enumerate(scans):
        pcd.write_pcd(os.path.join(folder, f"scan_{i:04d}.pcd"), s)
    reader = native.NativeSequenceReader(folder, capacity=2)
    assert len(reader) == 5
    got = list(reader)
    assert len(got) == 5
    for (pts, ts), ref in zip(got, scans):
        np.testing.assert_allclose(pts, ref, atol=1e-6)
    reader.close()


def test_sequence_save_load(tmp_path):
    seq = datasets.make_synthetic_sequence(
        n_scans=3, n_points=500, trajectory="straight",
        world_cfg=datasets.SyntheticWorldConfig(
            extent=10.0, n_ground=5000, n_walls=2000, n_pillars=1000))
    folder = str(tmp_path / "seq")
    datasets.save_sequence(seq, folder)
    loaded = datasets.load_sequence(folder)
    assert len(loaded) == 3
    np.testing.assert_allclose(loaded.scans[0], seq.scans[0], atol=1e-6)
    np.testing.assert_allclose(loaded.ground_truth[1], seq.ground_truth[1])


def test_load_sequence_pcd_folder(tmp_path, rng):
    folder = tmp_path / "pcds"
    folder.mkdir()
    scans = [rng.normal(size=(64, 3)).astype(np.float32) for _ in range(3)]
    for i, s in enumerate(scans):
        pcd.write_pcd(str(folder / f"cloud_{i:03d}.pcd"), s)
    seq = datasets.load_sequence(str(folder))
    assert len(seq) == 3
    for got, ref in zip(seq.scans, scans):
        np.testing.assert_allclose(got, ref, atol=1e-6)
    assert seq.timestamps[1] == pytest.approx(0.1)


def test_load_sequence_kitti_folder(tmp_path, rng):
    folder = tmp_path / "kitti_seq"
    (folder / "velodyne").mkdir(parents=True)
    scans = [rng.normal(size=(64, 4)).astype(np.float32) for _ in range(3)]
    for i, s in enumerate(scans):
        s.tofile(str(folder / "velodyne" / f"{i:06d}.bin"))
    (folder / "times.txt").write_text("0.0\n0.2\n0.4\n")
    poses = np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(-1)
    (folder / "poses.txt").write_text(
        "\n".join(" ".join(str(v) for v in poses) for _ in range(3)))
    seq = datasets.load_sequence(str(folder))
    assert len(seq) == 3
    np.testing.assert_allclose(seq.scans[1], scans[1][:, :3], atol=1e-6)
    assert seq.timestamps[2] == pytest.approx(0.4)
    assert len(seq.ground_truth) == 3
