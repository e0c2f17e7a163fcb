"""Mapping CLI — the ``mapping_node`` equivalent.

Mirrors ``ros/open3d_slam_ros/src/mapping_node.cpp:14-46`` +
``RosbagRangeDataProcessorRos`` offline replay
(``RosbagRangeDataProcessorRos.cpp:52-125``): load layered config, replay a
scan sequence as fast as possible with buffer backpressure, print the
realtime factor every 15 s, then ``finishProcessing`` and optional saving.

Usage:
  python -m open3d_slam_tpu.cli.mapping --sequence <dir-of-npz>
      [--param <yaml>] [--save-folder out] [--save-map] [--synthetic N]
"""
from __future__ import annotations

import argparse
import sys
import time
from typing import Optional

import numpy as np

from open3d_slam_tpu.io import datasets
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.utils import config as cfg

SKIP_FIRST_N_POINT_CLOUDS = 5  # magic.hpp:15, DataProcessorRos.cpp:34-41


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU-native open3d_slam mapping")
    ap.add_argument("--sequence", help="folder of scan_*.npz (io.datasets format)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate and run an N-scan synthetic circle sequence")
    ap.add_argument("--param", help="YAML/JSON parameter override file")
    ap.add_argument("--save-folder", default="./o3d_slam_out")
    ap.add_argument("--save-map", action="store_true")
    ap.add_argument("--save-submaps", action="store_true")
    ap.add_argument("--save-dense-submaps", action="store_true")
    ap.add_argument("--num-accumulated-range-data", type=int, default=1,
                    help="scan accumulation count (DataProcessorRos semantics)")
    ap.add_argument("--no-skip-first", action="store_true",
                    help="do not skip the first 5 clouds")
    return ap


def load_params(param_file: Optional[str]) -> cfg.SlamParameters:
    if param_file:
        return cfg.load_parameters_from_file(param_file)
    return cfg.SlamParameters()


def run_sequence(slam: SlamWrapper, seq: datasets.SyntheticSequence,
                 num_accumulated: int = 1, skip_first: int = SKIP_FIRST_N_POINT_CLOUDS,
                 report_every_sec: float = 15.0):
    """Offline replay with backpressure + realtime-factor reporting."""
    t_start = time.monotonic()
    t_last_report = t_start
    data_duration = 0.0
    accum = []
    n_processed = 0
    for i, (scan, ts) in enumerate(zip(seq.scans, seq.timestamps)):
        if i < skip_first:
            continue
        accum.append(scan)
        if len(accum) < num_accumulated:
            continue
        points = np.concatenate(accum, axis=0)
        accum = []
        # Backpressure (RosbagRangeDataProcessorRos.cpp:69-84): the pipeline
        # is sequential here, so "buffers full" cannot happen, but the hook
        # stays for the async driver.
        while slam.is_odometry_buffer_full() or slam.is_mapping_buffer_full():
            slam.process_queued()
        slam.process_scan(points, ts)
        n_processed += 1
        if seq.timestamps:
            data_duration = ts - seq.timestamps[0]
        now = time.monotonic()
        if now - t_last_report > report_every_sec:
            wall = now - t_start
            rtf = data_duration / wall if wall > 0 else 0.0
            print(f"Replayed {data_duration:.1f} s of data in {wall:.1f} s "
                  f"-> {rtf:.2f}x realtime ({n_processed} scans)")
            t_last_report = now
    slam.finish_processing()
    wall = time.monotonic() - t_start
    rtf = data_duration / wall if wall > 0 else 0.0
    print(f"DONE: {data_duration:.1f} s of data in {wall:.1f} s "
          f"-> {rtf:.2f}x realtime ({n_processed} scans)")
    return rtf


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    params = load_params(args.param)
    if args.save_map:
        params.saving.is_save_map = True
    if args.save_submaps:
        params.saving.is_save_submaps = True
    if args.save_dense_submaps:
        params.saving.is_save_dense_submaps = True

    if args.synthetic:
        seq = datasets.make_synthetic_sequence(
            n_scans=args.synthetic, trajectory="circle",
            radius=12.0, angle_total=2 * np.pi * 1.05)
    elif args.sequence:
        seq = datasets.load_sequence(args.sequence)
    else:
        print("need --sequence or --synthetic", file=sys.stderr)
        return 2

    slam = SlamWrapper(params)
    slam.folder_path = args.save_folder
    run_sequence(slam, seq,
                 num_accumulated=args.num_accumulated_range_data,
                 skip_first=0 if args.no_skip_first else SKIP_FIRST_N_POINT_CLOUDS)

    if params.saving.is_save_map or params.saving.is_save_at_mission_end:
        print("saved map to", slam.save_map())
    if params.saving.is_save_submaps:
        slam.dump_submaps("submap")
    if params.saving.is_save_dense_submaps:
        slam.dump_submaps("dense_submap", dense=True)

    if seq.ground_truth:
        times, poses = slam.get_trajectory()
        n = min(len(poses), len(seq.ground_truth))
        if n > 1:
            T0g, T0e = seq.ground_truth[0], poses[0]
            errs = [np.linalg.norm(
                (np.linalg.inv(T0g) @ seq.ground_truth[i])[:3, 3] -
                (np.linalg.inv(T0e) @ poses[i])[:3, 3]) for i in range(n)]
            print(f"ATE vs ground truth: mean {np.mean(errs):.3f} m, "
                  f"max {np.max(errs):.3f} m over {n} poses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
