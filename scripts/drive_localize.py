"""Stage-level timing of the multi-start localization funnel on the chip.

Replicates bench_multistart_localization's setup and times each funnel
stage (coarse sweep / rank / mid P2P pull-in / tight refine) with hard
syncs, to target the 5.3 s p50 (VERDICT r4 #3).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaves = [a for a in jax.tree_util.tree_leaves(x)
              if hasattr(a, "block_until_ready")]
    if leaves:
        jax.device_get([jnp.ravel(a)[:1] for a in leaves])


def main():
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    t0 = time.monotonic()
    np.asarray(jnp.arange(8))
    print(f"session acquired in {time.monotonic() - t0:.1f} s", flush=True)

    import bench
    from open3d_slam_tpu.ops import hashgrid, normals as normals_ops, registration as reg_ops, voxel
    from open3d_slam_tpu.parallel import multi_start
    from open3d_slam_tpu.utils import config as cfg, pointcloud as pclib

    num_hypotheses, n_map, n_scan = 1024, 32768, 8192
    rng = np.random.default_rng(4)
    map_pts = bench._structured_scene(rng, n_map)
    params = cfg.SlamParameters()
    params.mapper.scan_matcher.icp.max_correspondence_distance = 1.0
    params.mapper.scan_processing.voxel_size = 0.3
    map_pc = pclib.from_numpy(map_pts.astype(np.float32), capacity=n_map)
    T_true = np.eye(4)
    T_true[:3, 3] = [4.0, -3.0, 0.0]
    d = np.linalg.norm(map_pts[:, :2] - T_true[:2, 3], axis=1)
    vis = map_pts[d < 14.0]
    sel = rng.choice(len(vis), n_scan, replace=False)
    scan_pts = (vis[sel] - T_true[:3, 3]).astype(np.float32)
    scan = pclib.from_numpy(scan_pts, capacity=n_scan)

    # Mirror global_localize's prep.
    sp = params.mapper.scan_processing
    icp = params.mapper.scan_matcher.icp
    scan_v = voxel.voxel_downsample(scan, max(sp.voxel_size, 1e-3))
    scan_small = pclib.compact_to(
        voxel.random_downsample(scan_v, 512, jax.random.PRNGKey(11)),
        pclib.padded_capacity(512))
    n_rank = min(2048, scan_v.capacity)
    scan_rank = pclib.compact_to(
        voxel.random_downsample(scan_v, n_rank, jax.random.PRNGKey(12)),
        pclib.padded_capacity(n_rank))
    m = normals_ops.estimate_normals(map_pc, radius=icp.max_distance_knn,
                                     max_nn=icp.knn)
    grid = hashgrid.build(m, cell_size=icp.max_correspondence_distance)
    mask_np = np.asarray(m.mask)
    pts_np = np.asarray(m.points)[mask_np]
    inits = multi_start.make_pose_hypotheses(
        np.asarray(m.points), mask_np, num_hypotheses,
        z=float(pts_np[:, 2].mean() + 1.0))
    extent = float(max(np.ptp(pts_np[:, 0]), np.ptp(pts_np[:, 1])))
    n_xy = max(1, int(np.sqrt(num_hypotheses / 8)))
    spacing = extent / max(n_xy - 1, 1)
    coarse_corr = max(icp.max_correspondence_distance, 0.75 * spacing)
    coarse_grid = hashgrid.build(m, cell_size=coarse_corr)
    mid_corr = max(2.0 * icp.max_correspondence_distance, 2.0)
    mid_grid = hashgrid.build(m, cell_size=mid_corr)
    inits_j = jnp.asarray(inits)
    sync((coarse_grid, mid_grid, grid, scan_small, scan_rank, scan_v))

    def timed(name, fn, n=2):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        print(f"{name:34s}: {(time.perf_counter()-t0)/n*1e3:8.1f} ms",
              flush=True)
        return out

    # End-to-end: warmup run pays compiles, then profiled warm runs.
    for tag in ("cold", "warm1", "warm2"):
        t0 = time.perf_counter()
        T, fit = multi_start.global_localize(scan, map_pc, params,
                                             num_hypotheses=num_hypotheses)
        print(f"global_localize {tag}: {(time.perf_counter()-t0)*1e3:.0f} ms"
              f"  fit={fit:.3f} "
              f"t_err={np.linalg.norm(np.asarray(T)[:3,3]-T_true[:3,3]):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
