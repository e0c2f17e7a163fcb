"""Reproduce + diagnose fitness-0.000 dropouts on the bench sim scenario.

Runs the first N scans of the bench scenario (vlp16 yard circle, seed 11,
undistort ON — the exact setup where odometry failed at scan ~6 and
scan2map skipped at ~12 with fitness 0.000) and prints per-scan cloud
health: point counts, NaN counts, velocity estimates, registration stats.

CPU-runnable (slow but exact): the dropout mechanism is host-visible.
Usage:  python scripts/debug_dropouts.py [n_scans]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_tpu.io import lidar_sim
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.ops import motion_compensation as mc_ops
from open3d_slam_tpu.utils import config as cfg


def stats(pc):
    pts = np.asarray(pc.points)
    mask = np.asarray(pc.mask)
    nan = int(np.isnan(pts[mask]).any(axis=1).sum()) if mask.any() else 0
    big = int((np.abs(pts[mask]) > 1e4).any(axis=1).sum()) if mask.any() else 0
    return int(mask.sum()), nan, big


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    spec = lidar_sim.SimSequenceSpec(
        name="bench", sensor="vlp16", world="yard", trajectory="circle",
        n_scans=n_scans, seed=11)
    seq = lidar_sim.make_sim_sequence(spec)
    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True
    slam = SlamWrapper(params)

    orig_undistort = slam._undistort

    def undistort_logged(measurement, which):
        out = orig_undistort(measurement, which)
        n, nan, big = stats(out)
        p = params.motion_compensation
        buf = (slam.odometry.odom_buffer if which == "odom"
               else slam.mapper.map_to_range_sensor_buffer)
        vel = ""
        if len(buf) > p.num_poses_velocity_estimation:
            fin = buf.latest_measurement(0)
            st = buf.latest_measurement(p.num_poses_velocity_estimation)
            dt = fin.time - st.time
            if dt > 0:
                lin, ang = mc_ops.estimate_velocities(
                    jnp.asarray(st.transform, jnp.float32),
                    jnp.asarray(fin.transform, jnp.float32), dt)
                vel = (f" |v|={float(jnp.linalg.norm(lin)):.2f}"
                       f" |w|={float(jnp.linalg.norm(ang)):.2f} dt={dt:.2f}")
        print(f"    undistort[{which}]: n={n} nan={nan} big={big}{vel}",
              flush=True)
        return out

    slam._undistort = undistort_logged

    s2m = slam.mapper.scan_to_map_reg
    orig_reg = s2m.scan_to_map_registration

    def reg_logged(scan, submap, m2rs, init):
        res = orig_reg(scan, submap, m2rs, init)
        fit, it, T = jax.device_get(
            (res.fitness, res.num_iterations, res.transformation))
        n_map = int(submap.map_cloud.count())
        print(f"    s2m: fit={float(fit):.3f} it={int(it)} "
              f"map_n={n_map} init_t={np.asarray(init)[:3,3].round(2)} "
              f"out_t={np.asarray(T)[:3,3].round(2)}", flush=True)
        return res

    s2m.scan_to_map_registration = reg_logged

    for i, (scan, ts) in enumerate(zip(seq.scans, seq.timestamps)):
        print(f"scan {i}: raw={scan.shape[0]}", flush=True)
        t0 = time.perf_counter()
        slam.process_scan(scan, ts)
        o = slam.odometry
        prev_n = int(o.prev.cloud.count()) if o.prev else -1
        gt_t = np.asarray(seq.ground_truth[i])[:3, 3] - \
            np.asarray(seq.ground_truth[0])[:3, 3]
        print(f"    odom_cum_t={np.asarray(o.odom_to_range_sensor_cumulative)[:3,3].round(2)}"
              f" prev_n={prev_n}  map_t="
              f"{slam.mapper.map_to_range_sensor[:3,3].round(2)}"
              f" gt_rel={gt_t.round(2)}"
              f"  ({time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
