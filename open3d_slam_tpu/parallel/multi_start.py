"""Multi-start batched localization (BASELINE config 4).

The reference's localization mode needs a user-provided initial pose
(``SlamMapInitializer.cpp:51-78``, interactive rviz marker).  On TPU we can
instead sweep ~1024 pose hypotheses in one batched ICP program: stratified
(x, y, yaw) seeds over the map extent -> short coarse ICP on a subsampled
scan -> fitness ranking -> full ICP refinement of the best candidates.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.ops import hashgrid, normals as normals_ops, registration as reg_ops, voxel
from open3d_slam_tpu.utils import pointcloud as pclib, se3
from open3d_slam_tpu.utils.config import SlamParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud


def make_pose_hypotheses(map_points: np.ndarray, map_mask: np.ndarray,
                         num_hypotheses: int, z: float = 0.0) -> np.ndarray:
    """Stratified (x, y, yaw) grid over the map's bounding box -> (H, 4, 4)."""
    pts = map_points[map_mask]
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    n_yaw = 8
    n_xy = max(1, int(np.sqrt(num_hypotheses / n_yaw)))
    xs = np.linspace(lo[0], hi[0], n_xy)
    ys = np.linspace(lo[1], hi[1], n_xy)
    yaws = np.linspace(0, 2 * np.pi, n_yaw, endpoint=False)
    T = []
    for x in xs:
        for y in ys:
            for yaw in yaws:
                c, s = np.cos(yaw), np.sin(yaw)
                M = np.eye(4, dtype=np.float32)
                M[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
                M[:3, 3] = [x, y, z]
                T.append(M)
    T = np.stack(T)
    # Pad/trim to num_hypotheses.
    if len(T) < num_hypotheses:
        reps = int(np.ceil(num_hypotheses / len(T)))
        T = np.tile(T, (reps, 1, 1))
    return T[:num_hypotheses]


def _chunked_vmap(fn, xs: jnp.ndarray, chunk: int):
    """vmap ``fn`` over the leading axis in sequential chunks of ``chunk``
    (``lax.map`` outside, ``vmap`` inside).  Bounds peak memory: on TPU the
    bruteforce NN materializes an (m_scan, n_map) distance block PER
    HYPOTHESIS — a flat vmap over 1024 hypotheses would allocate hundreds
    of GB.  ``chunk`` must divide ``xs.shape[0]``."""
    n = xs.shape[0]
    chunk = min(chunk, n)
    while n % chunk != 0:
        chunk -= 1
    if chunk == 1:
        # no batch dim at all — keeps Pallas kernels un-vmapped (vmapping
        # pallas_call compiles pathologically on some runtimes)
        return jax.lax.map(fn, xs)
    xr = xs.reshape(n // chunk, chunk, *xs.shape[1:])
    out = jax.lax.map(lambda c: jax.vmap(fn)(c), xr)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n, *a.shape[2:]), out)


def _batched_localize(scan_small: PointCloud, scan_mid: PointCloud,
                      scan_rank: PointCloud, scan_full: PointCloud,
                      coarse_grid: hashgrid.HashGrid,
                      mid_grid: hashgrid.HashGrid,
                      grid: hashgrid.HashGrid, inits: jnp.ndarray,
                      coarse_corr_dist, mid_corr_dist, max_corr_dist,
                      coarse_iters: int = 10, mid_iters: int = 12,
                      refine_iters: int = 12, top_k: int = 64,
                      profile: bool = False):
    """Multi-resolution batched localization funnel:
      1. coarse point-to-plane sweep of ALL hypotheses at ~grid-spacing
         correspondence distance (subsampled scan vs a COARSE-voxel map —
         a 5 m basin does not need a 0.3 m map; measured ~3x cheaper) —
         lands within ~1-2 m;
      2. rank by tight-distance score at the coarse poses: the fused
         batched kernel with ``max_iterations=0`` IS evaluate_registration
         for the whole batch in one sweep (bit-identical fitness/rmse,
         measured; keep a GENEROUS top_k — the true basin can rank ~35th
         of 256 on the coarse score);
      3. mid-distance POINT-TO-POINT pull-in of the top_k (point-to-plane
         diverges from ~1.4 m offsets on plane-dominated scenes; P2P's
         translation basin is much wider) on a 1024-point subsample vs a
         mid-voxel map;
      4. tight batched point-to-plane refinement on the 2048-point rank
         cloud; winner by fitness - rmse;
      5. ONE final full-scan registration of the winner at full map
         resolution recovers the precision the funnel subsamples away.

    On TPU the point-to-plane stages run through the NATIVELY-BATCHED fused
    Pallas kernel in its shared-map layout (the map streams from HBM once
    per sweep for the whole hypothesis batch — the kernel was designed for
    exactly this workload); the P2P stage runs un-vmapped under ``lax.map``
    so the NN routes to the fused flash kernel (a vmapped bruteforce sweep
    would materialize (chunk, m, n) distance blocks and is ~10x slower).
    On CPU the probe path vmaps cheaply, so chunks stay wide.  Deliberately
    NOT wrapped in one outer jit: fusing all the chunked loops into a
    single XLA program deterministically faults the v5e TPU worker runtime
    (the stages dispatched separately run fine), and the inter-stage glue
    is a few tiny transfers against a seconds-scale device workload.
    """
    from open3d_slam_tpu.ops import pallas_icp
    tpu = jax.default_backend() == "tpu"
    nn = "auto" if tpu else "probe"
    cc, ce = (1, 1) if tpu else (32, 4)
    batched_ok = (tpu and coarse_grid.normals_sorted is not None and
                  pallas_icp.supports(scan_small.capacity,
                                      coarse_grid.capacity) and
                  pallas_icp.supports(scan_rank.capacity, grid.capacity))

    if profile:
        import time as _time

        def _mark(name, out):
            leaves = [a for a in jax.tree_util.tree_leaves(out)
                      if hasattr(a, "block_until_ready")]
            if leaves:
                jax.device_get([jnp.ravel(a)[:1] for a in leaves])
            now = _time.perf_counter()
            print(f"[localize] {name:8s}: {(now - _mark.t0) * 1e3:8.1f} ms "
                  f"(batched_ok={batched_ok})", flush=True)
            _mark.t0 = now
        _mark.t0 = _time.perf_counter()
    else:
        def _mark(name, out):
            pass

    if batched_ok:
        coarse = reg_ops.batched_icp_point_to_plane(
            scan_small, coarse_grid, inits, coarse_corr_dist,
            max_iterations=coarse_iters)
    else:
        coarse = _chunked_vmap(lambda T0: reg_ops.icp_point_to_plane(
            scan_small, coarse_grid, T0, coarse_corr_dist,
            max_iterations=coarse_iters, bucket_size=8, nn_method=nn),
            inits, chunk=cc)
    _mark("coarse", coarse)
    # Wide-distance fitness saturates (everything snaps to the dominant
    # plane); rank candidates by TIGHT-distance fitness at the coarse
    # result, on a mid-size subsample (512 points under-rank the true
    # basin; the full cloud pays NN cost for no extra discrimination).
    if batched_ok:
        tight = reg_ops.batched_icp_point_to_plane(
            scan_rank, grid, coarse.transformation, max_corr_dist,
            max_iterations=0)
    else:
        tight = _chunked_vmap(lambda T0: reg_ops.evaluate_registration(
            scan_rank, grid, T0, max_corr_dist, nn_method=nn),
            coarse.transformation, chunk=ce)
    _mark("rank", tight)
    score = tight.fitness - tight.inlier_rmse
    _, best_idx = jax.lax.top_k(score, top_k)
    best_inits = coarse.transformation[best_idx]
    mid = _chunked_vmap(lambda T0: reg_ops.icp_point_to_point(
        scan_mid, mid_grid, T0, mid_corr_dist, max_iterations=mid_iters,
        nn_method=nn), best_inits, chunk=ce)
    _mark("mid", mid)
    if batched_ok:
        refined = reg_ops.batched_icp_point_to_plane(
            scan_rank, grid, mid.transformation, max_corr_dist,
            max_iterations=refine_iters)
    else:
        refined = _chunked_vmap(lambda T0: reg_ops.icp_point_to_plane(
            scan_rank, grid, T0, max_corr_dist, max_iterations=refine_iters,
            nn_method=nn), mid.transformation, chunk=ce)
    _mark("refine", refined)
    score_r = refined.fitness - refined.inlier_rmse
    win = jnp.argmax(score_r)
    final = reg_ops.icp_point_to_plane(
        scan_full, grid, refined.transformation[win], max_corr_dist,
        max_iterations=10, nn_method=nn)
    _mark("final", final)
    return final.transformation, final.fitness


def global_localize(scan: PointCloud, map_cloud: PointCloud,
                    params: SlamParameters,
                    num_hypotheses: int = 1024,
                    coarse_scan_points: int = 512) -> Tuple[np.ndarray, float]:
    """Localize ``scan`` in ``map_cloud`` with no initial pose."""
    sp = params.mapper.scan_processing
    icp = params.mapper.scan_matcher.icp
    scan_v = voxel.voxel_downsample(scan, max(sp.voxel_size, 1e-3))
    scan_small = pclib.compact_to(
        voxel.random_downsample(scan_v, coarse_scan_points,
                                jax.random.PRNGKey(11)),
        pclib.padded_capacity(coarse_scan_points))
    n_mid = min(1024, scan_v.capacity)
    scan_mid = pclib.compact_to(
        voxel.random_downsample(scan_v, n_mid, jax.random.PRNGKey(13)),
        pclib.padded_capacity(n_mid))
    n_rank = min(2048, scan_v.capacity)
    scan_rank = pclib.compact_to(
        voxel.random_downsample(scan_v, n_rank, jax.random.PRNGKey(12)),
        pclib.padded_capacity(n_rank))
    m = map_cloud
    if m.normals is None:
        m = normals_ops.estimate_normals(m, radius=icp.max_distance_knn,
                                         max_nn=icp.knn)
    grid = hashgrid.build(m, cell_size=icp.max_correspondence_distance)
    mask_np = np.asarray(m.mask)
    pts_np = np.asarray(m.points)[mask_np]
    inits = make_pose_hypotheses(np.asarray(m.points), mask_np, num_hypotheses,
                                 z=float(pts_np[:, 2].mean() + 1.0))
    # Coarse basin: ~half the (x, y) seed spacing.
    extent = float(max(np.ptp(pts_np[:, 0]), np.ptp(pts_np[:, 1])))
    n_xy = max(1, int(np.sqrt(num_hypotheses / 8)))
    spacing = extent / max(n_xy - 1, 1)
    coarse_corr = max(icp.max_correspondence_distance, 0.75 * spacing)
    mid_corr = max(2.0 * icp.max_correspondence_distance, 2.0)
    # Multi-resolution maps for the wide-basin stages: a coarse basin does
    # not need a fine map, and the funnel's kernel cost scales with the
    # map row count.  The final winner registration runs at full
    # resolution, so no precision is lost.
    coarse_map = normals_ops.estimate_normals(
        voxel.voxel_downsample(m, max(0.5, float(coarse_corr) / 4.0),
                               out_capacity=max(m.capacity // 4, 1024)),
        radius=icp.max_distance_knn, max_nn=icp.knn)
    coarse_grid = hashgrid.build(coarse_map, cell_size=coarse_corr)
    mid_map = voxel.voxel_downsample(
        m, max(0.4, float(mid_corr) / 5.0),
        out_capacity=max(m.capacity // 2, 2048))
    mid_grid = hashgrid.build(mid_map, cell_size=mid_corr)
    T, fitness = _batched_localize(
        scan_small, scan_mid, scan_rank, scan_v, coarse_grid, mid_grid, grid,
        jnp.asarray(inits),
        coarse_corr, mid_corr, icp.max_correspondence_distance,
        top_k=min(64, int(inits.shape[0])),
        profile=os.environ.get("O3D_LOCALIZE_PROFILE", "") == "1")
    return np.asarray(T, np.float64), float(fitness)
