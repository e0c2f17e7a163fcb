"""Per-stage TPU profile of the full SLAM pipeline on the bench scenario.

Instruments the hot path of ``SlamWrapper.process_scan`` (odometry
preprocess / scan2scan ICP / mapper preprocess / scan2map prepare+ICP /
submap insert / dense map) with HARD device syncs (host transfers) at each
stage boundary so costs are attributed where they occur — the async
dispatch otherwise drains a stage's cost into whatever blocks next.

Usage (real TPU, see .claude/skills/verify/SKILL.md):
  timeout 580 env PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/profile_pipeline.py [n_scans] 2>&1 | grep -v WARNING

Prints per-scan stage timings + per-stage medians over the steady state,
and every registration's fitness (to spot fitness-0.000 dropouts).
"""
import sys
import time

import numpy as np
import jax

from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from open3d_slam_tpu.io import lidar_sim
from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
from open3d_slam_tpu.models import odometry as odo_mod, mapper as map_mod
from open3d_slam_tpu.models import submap as submap_mod
from open3d_slam_tpu.utils import config as cfg


def sync(x):
    """Hard sync at ~one tunnel round-trip: ONE batched device_get of a
    1-element slice of every leaf.  (block_until_ready costs a full RTT
    PER LEAF on this backend and can return at enqueue time; transferring
    full arrays bills tunnel bandwidth — ~150 ms for a 262k-point cloud —
    to whatever stage is being timed.)"""
    import jax.numpy as jnp
    leaves = [a for a in jax.tree_util.tree_leaves(x)
              if hasattr(a, "block_until_ready")]
    if leaves:
        jax.device_get([jnp.ravel(a)[:1] for a in leaves])
    return x


TIMES = {}


def record(name, dt):
    TIMES.setdefault(name, []).append(dt)


def timed(name, fn):
    def wrapper(*args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        record(name, time.perf_counter() - t0)
        return out
    return wrapper


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    # Self-limit: exit CLEANLY before an outer `timeout` can kill us mid
    # TPU op (a mid-transfer SIGTERM wedges the remote chip for ~20+ min).
    budget_s = float(sys.argv[2]) if len(sys.argv) > 2 else 500.0
    t_budget0 = time.perf_counter()

    # Optional 3rd arg: a named benchmark sequence (e.g. os0_corridor_walk)
    # to profile that sensor/world's shapes instead of the vlp16 default.
    named = [k for k in sorted(lidar_sim.BENCHMARK_SEQUENCES)
             if len(sys.argv) > 3 and k.startswith(sys.argv[3])]
    if named:
        import dataclasses
        spec = dataclasses.replace(lidar_sim.BENCHMARK_SEQUENCES[named[0]],
                                   n_scans=n_scans)
    else:
        spec = lidar_sim.SimSequenceSpec(
            name="bench", sensor="vlp16", world="yard", trajectory="circle",
            n_scans=n_scans, seed=11)
    t0 = time.perf_counter()
    seq = lidar_sim.make_sim_sequence(spec)
    print(f"sim render: {time.perf_counter() - t0:.1f} s "
          f"({n_scans} scans, {seq.scans[0].shape[0]} pts/scan)", flush=True)

    params = cfg.load_parameters_from_file(cfg.config_path(spec.param_file))
    params.motion_compensation.is_undistort_input_cloud = True
    slam = SlamWrapper(params)

    # --- instrument the hot path ------------------------------------------
    odo = slam.odometry
    odo.preprocess = timed("odo_preprocess", odo.preprocess)
    odo.registration.register = timed("odo_icp", odo.registration.register)
    odo.registration.prepare_target = timed("odo_prep_target",
                                            odo.registration.prepare_target)
    s2m = slam.mapper.scan_to_map_reg
    s2m.process_for_scan_matching_and_merging = timed(
        "map_preprocess", s2m.process_for_scan_matching_and_merging)
    s2m.registration.prepare_target = timed("s2m_prep_target",
                                            s2m.registration.prepare_target)
    s2m.registration.register = timed("s2m_icp", s2m.registration.register)
    for sm_obj in [slam.submaps]:
        orig_insert = sm_obj.insert_scan
        def insert_wrap(*a, _f=orig_insert, _s=sm_obj, **kw):
            t0 = time.perf_counter()
            out = _f(*a, **kw)
            sync(_s.get_active_submap().map_cloud)
            record("submap_insert", time.perf_counter() - t0)
            return out
        sm_obj.insert_scan = insert_wrap

    totals = []
    for i, (scan, ts) in enumerate(zip(seq.scans, seq.timestamps)):
        if time.perf_counter() - t_budget0 > budget_s:
            print(f"[budget] {budget_s:.0f} s elapsed; stopping at scan {i}",
                  flush=True)
            n_scans = i
            break
        t0 = time.perf_counter()
        slam.process_scan(scan, ts)
        dt = time.perf_counter() - t0
        totals.append(dt)
        parts = {k: v[-1] for k, v in TIMES.items() if v and len(v) >= 1}
        last = " ".join(f"{k}={TIMES[k][-1]*1e3:.0f}" for k in sorted(TIMES)
                        if TIMES[k])
        print(f"scan {i:3d}: total={dt*1e3:7.0f} ms  {last}", flush=True)

    warm = max(6, n_scans // 4)
    if n_scans <= warm:
        print("too few scans processed for steady-state stats")
        return
    print("\n--- steady-state medians (scans >= %d) ---" % warm)
    for k in sorted(TIMES):
        vals = TIMES[k][- (n_scans - warm):]
        if vals:
            print(f"{k:18s} p50={np.median(vals)*1e3:8.1f} ms  "
                  f"mean={np.mean(vals)*1e3:8.1f} ms  n={len(vals)}")
    tail = totals[warm:]
    print(f"{'TOTAL':18s} p50={np.median(tail)*1e3:8.1f} ms  "
          f"mean={np.mean(tail)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
