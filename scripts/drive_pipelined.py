"""Verify drive: pipelined vs serial replay A/B on the real chip.

One process (session throughput varies ~4x between sessions), internal
budget, hard syncs via tiny transfers.  Prints per-scan p50/mean for both
modes + trajectory agreement.
"""
import sys
import time

import numpy as np


def main():
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    t0 = time.monotonic()
    np.asarray(jnp.arange(8))
    print(f"session acquired in {time.monotonic() - t0:.1f} s", flush=True)

    from open3d_slam_tpu.io import lidar_sim
    from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
    from open3d_slam_tpu.utils import config as cfg

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spec = lidar_sim.SimSequenceSpec(
        name="drive", sensor="vlp16", world="yard", trajectory="circle",
        n_scans=n, seed=11)
    seq = lidar_sim.make_sim_sequence(spec)
    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True

    def run(pipelined, warmup=10):
        slam = SlamWrapper(params)
        times = []
        for i, (scan, ts) in enumerate(zip(seq.scans, seq.timestamps)):
            t = time.perf_counter()
            if pipelined:
                slam.process_scan_pipelined(scan, ts)
            else:
                slam.process_scan(scan, ts)
            dt = time.perf_counter() - t
            if i >= warmup:
                times.append(dt)
        slam.finish_processing()
        _, poses = slam.get_trajectory()
        return np.array(times) * 1e3, poses

    for label, pipelined in (("serial", False), ("pipelined", True),
                             ("pipelined2", True)):
        t_run = time.monotonic()
        times, poses = run(pipelined)
        print(f"{label:11s}: p50 {np.median(times):6.1f} ms/scan  "
              f"mean {times.mean():6.1f}  n_poses {len(poses)}  "
              f"wall {time.monotonic() - t_run:.1f} s", flush=True)
        if label == "serial":
            ref_poses = poses
        else:
            errs = [np.linalg.norm(a[:3, 3] - b[:3, 3])
                    for a, b in zip(ref_poses, poses)]
            print(f"             max |t| diff vs serial: {max(errs):.2e} m",
                  flush=True)


if __name__ == "__main__":
    main()
