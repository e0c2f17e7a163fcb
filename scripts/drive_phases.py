"""Phase-level host timing of the pipelined per-scan path on the real chip.

Measures, per scan: ingest (H2D), odometry dispatch, mapper prep dispatch,
finalize (the blocking pull), s2m dispatch, post stages.  Tells us whether
dispatch itself blocks on the tunnel (in which case fewer/bigger programs
win, not reordering).
"""
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

    import sys
    n = 32
    if len(sys.argv) > 1 and sys.argv[1] in lidar_sim.BENCHMARK_SEQUENCES:
        spec = lidar_sim.BENCHMARK_SEQUENCES[sys.argv[1]]
        seq = lidar_sim.make_sim_sequence(spec)
        seq.scans, seq.timestamps = seq.scans[:40], seq.timestamps[:40]
    else:
        spec = lidar_sim.SimSequenceSpec(
            name="drive", sensor="vlp16", world="yard", trajectory="circle",
            n_scans=40, seed=11)
        seq = lidar_sim.make_sim_sequence(spec)
    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True

    slam = SlamWrapper(params)
    phases = {k: [] for k in ("ingest", "odo_dispatch", "prep_dispatch",
                              "flush_pull", "s2m_dispatch")}
    for i, (scan, ts) in enumerate(zip(seq.scans[:n], seq.timestamps[:n])):
        rec = i >= 10
        t = time.perf_counter()
        slam.add_range_scan(scan, ts)
        t1 = time.perf_counter()
        slam._odometry_step()
        t2 = time.perf_counter()
        measurement = slam.mapping_buffer.pop()
        cloud = slam._undistort(measurement, "map")
        processed = None
        if not slam.submaps.get_active_submap().is_empty():
            processed = slam.mapper.preprocess_scan(cloud)
        t3 = time.perf_counter()
        slam._flush_map_pending()
        t4 = time.perf_counter()
        mp, _ = slam.mapper.dispatch_range_measurement(
            cloud, measurement.time, odom_pending=measurement.odom_pending,
            processed=processed)
        t5 = time.perf_counter()
        if mp is not None:
            slam._map_pending = (mp, measurement, cloud)
        else:
            slam._post_mapping_stages(measurement, cloud)
        if rec:
            for k, d in zip(phases, (t1 - t, t2 - t1, t3 - t2, t4 - t3,
                                     t5 - t4)):
                phases[k].append(d * 1e3)
    slam.finish_processing()
    total = 0.0
    for k, v in phases.items():
        a = np.array(v)
        print(f"{k:13s}: p50 {np.median(a):7.1f} ms  mean {a.mean():7.1f}  "
              f"max {a.max():7.1f}", flush=True)
        total += np.median(a)
    print(f"sum of p50s: {total:.1f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
