"""Localization CLI — map-initialized mode with multi-start batched ICP.

Mirrors the reference's ``SlamMapInitializer`` flow
(``ros/open3d_slam_ros/src/SlamMapInitializer.cpp:51-78`` +
``mapping_node.cpp:37-41``): load a PCD map, set the initial transform, run
with ``is_use_initial_map`` (optionally without merging scans).

TPU upgrade over the reference: ``--global-init`` runs a batched multi-start
point-to-plane ICP over N pose hypotheses (vmapped over the hypothesis axis)
to localize WITHOUT a user-provided initial pose — this is where device
batching qualitatively beats the CPU design (BASELINE config 4).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from open3d_slam_tpu.io import datasets, pcd
from open3d_slam_tpu.models.map_initializer import SlamMapInitializer
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.parallel import multi_start
from open3d_slam_tpu.utils import config as cfg, pointcloud as pclib


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU-native open3d_slam localization")
    ap.add_argument("--map", required=True, help="PCD map file")
    ap.add_argument("--sequence", help="folder of scan_*.npz to localize")
    ap.add_argument("--param", help="YAML/JSON parameter override file")
    ap.add_argument("--initial-pose", nargs=6, type=float, default=None,
                    metavar=("x", "y", "z", "roll", "pitch", "yaw"),
                    help="initial pose (m, rad)")
    ap.add_argument("--global-init", action="store_true",
                    help="batched multi-start ICP global localization")
    ap.add_argument("--num-hypotheses", type=int, default=1024)
    ap.add_argument("--merge-scans", action="store_true",
                    help="keep extending the loaded map")
    ap.add_argument("--interactive-init-scans", type=int, default=0,
                    metavar="N",
                    help="treat the first N scans as an interactive "
                         "initialization window: merging off and the "
                         "min-refinement-fitness gate ignored until the "
                         "window closes (SlamMapInitializer::initializeWorker "
                         "gate relaxation, SlamMapInitializer.cpp:79-93)")
    return ap


def pose_from_xyzrpy(x, y, z, roll, pitch, yaw) -> np.ndarray:
    from scipy.spatial.transform import Rotation
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("ZYX", [yaw, pitch, roll]).as_matrix()
    T[:3, 3] = [x, y, z]
    return T


def main(argv=None) -> int:
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    params = cfg.load_parameters_from_file(args.param) if args.param else cfg.SlamParameters()
    params.mapper.is_use_initial_map = True
    params.mapper.is_merge_scans_into_map = bool(args.merge_scans)
    params.mapper.is_attempt_loop_closures = False

    map_data = pcd.read_pcd(args.map)
    print(f"loaded map with {map_data['points'].shape[0]} points")

    slam = SlamWrapper(params)
    initializer = SlamMapInitializer(slam)
    initializer.initialize(map_data["points"])

    if not args.sequence:
        print("map loaded; provide --sequence to localize scans")
        return 0
    seq = datasets.load_sequence(args.sequence)

    if args.global_init:
        scan0 = pclib.from_numpy(seq.scans[0],
                                 capacity=params.capacities.processed_scan)
        t0 = time.monotonic()
        T_init, fitness = multi_start.global_localize(
            scan0, slam.mapper.submaps.get_active_submap().map_cloud,
            params, num_hypotheses=args.num_hypotheses)
        print(f"global init: fitness {fitness:.3f} in "
              f"{time.monotonic() - t0:.2f} s over {args.num_hypotheses} hypotheses")
        slam.set_initial_transform(T_init)
    elif args.initial_pose is not None:
        slam.set_initial_transform(pose_from_xyzrpy(*args.initial_pose))

    if args.interactive_init_scans > 0:
        initializer.begin_interactive_init()
    for i, (scan, ts) in enumerate(zip(seq.scans, seq.timestamps)):
        if args.interactive_init_scans and i == args.interactive_init_scans:
            initializer.finish_initialization()
        slam.process_scan(scan, ts)
        initializer.notify_scan_processed()
        T = slam.mapper.map_to_range_sensor
        print(f"t={ts:.2f} pose xyz=({T[0,3]:.2f}, {T[1,3]:.2f}, {T[2,3]:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
