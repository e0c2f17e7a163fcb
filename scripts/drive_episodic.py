"""Profile the episodic (per-finished-submap) stages at deployed shapes:
feature computation, odometry-constraint building, loop-closure matching.
These dominate closure-heavy replay (measured 4.4 s + 1.5 s per event on
vlp16_yard_two_loops, ~60 s of a 152 s run).
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


def timed(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    print(f"{name:44s}: {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)
    return out


def main():
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    t0 = time.monotonic()
    np.asarray(jnp.arange(8))
    print(f"session acquired in {time.monotonic() - t0:.1f} s", flush=True)

    from open3d_slam_tpu.ops import (fpfh as fpfh_ops, hashgrid, normals as
                                     normals_ops, overlap as overlap_ops,
                                     pose_graph as pg_ops, voxel)
    from open3d_slam_tpu.utils import pointcloud as pclib, se3

    rng = np.random.default_rng(0)
    C = 163840
    n_real = 110000

    def make_map(offset):
        pts = rng.uniform(-25, 25, (n_real, 3)).astype(np.float32) + offset
        pts[:, 2] = np.abs(pts[:, 2]) * 0.1
        return pclib.from_numpy(pts, capacity=C)

    src = make_map(np.zeros(3, np.float32))
    tgt = make_map(np.array([10, 0, 0], np.float32))

    # --- compute_features parts (feature_capacity 8192) ---
    sparse = timed("feat: voxel_down 163840 -> 8192 @0.5",
                   jax.jit(lambda m: voxel.voxel_downsample(
                       m, 0.5, out_capacity=8192)), src)
    sparse_n = timed("feat: normals 8192 (knn 20)",
                     jax.jit(lambda s: normals_ops.estimate_normals(
                         s, 1.0, max_nn=20,
                         orientation_reference=jnp.zeros(3, jnp.float32))),
                     sparse)
    timed("feat: fpfh 8192 (r 2.5, nn 64)",
          lambda: fpfh_ops.compute_fpfh(sparse_n, 2.5, max_nn=64))

    # --- build_odometry_constraint parts ---
    masks = timed("constraint: overlapping_masks @2.0",
                  jax.jit(lambda a, b: overlap_ops.overlapping_masks(
                      a, b, jnp.eye(4), 2.0)), src, tgt)
    src_m = src.with_(mask=src.mask & masks[0])
    tgt_m = tgt.with_(mask=tgt.mask & masks[1])
    grid = timed("constraint: hashgrid.build 163840",
                 jax.jit(lambda t: hashgrid.build(t, 0.3)), tgt_m)
    nn = timed("constraint: query_nearest 163840",
               jax.jit(lambda g, p: hashgrid.query_nearest(g, p, 0.3)),
               grid, src_m.points)
    idx, d2, found = nn
    timed("constraint: info matrix 163840",
          jax.jit(lambda q, m: pg_ops.information_matrix_from_correspondences(
              q, m)), grid.points_sorted[idx], found & src_m.mask)

    # --- place recognition (loop closure) parts ---
    from open3d_slam_tpu.models.cloud_registration import cloud_registration_factory
    from open3d_slam_tpu.ops import ransac
    from open3d_slam_tpu.utils import config as cfg
    params = cfg.load_parameters_from_file(cfg.config_path("velodyne_puck16.yaml"))
    p = params.mapper.place_recognition
    f1 = fpfh_ops.compute_fpfh(sparse_n, 2.5, max_nn=64)
    key = jax.random.PRNGKey(0)
    timed("LC: ransac_feature_registration 8192",
          lambda: ransac.ransac_feature_registration(
              sparse_n, f1, sparse_n, f1,
              max_correspondence_distance=p.ransac_max_correspondence_distance,
              edge_length_similarity=p.correspondence_checker_edge_length,
              distance_threshold=p.correspondence_checker_distance,
              num_hypotheses=4096, mutual_filter=True, key=key))
    reg = cloud_registration_factory(cfg.CloudRegistrationParameters(
        reg_type=params.mapper.scan_matcher.scan_to_map_reg_type,
        icp=params.mapper.scan_matcher.icp))
    prepared = timed("LC: prepare_target overlap (163840)",
                     lambda: reg.prepare_target(tgt_m))
    timed("LC: refine register 163840v163840",
          lambda: reg.register(src_m, prepared, jnp.eye(4)), n=1)


if __name__ == "__main__":
    main()
