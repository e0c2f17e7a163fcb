"""Sharded registration: batch-parallel and correspondence-block-parallel ICP.

The BASELINE north-star decomposition: thousands of registrations / blocks
in flight, per-block 6x6 JtJ/Jtr reduced with ``psum`` across the mesh.

Two composable axes (see parallel/mesh.py):
  * ``data``  — vmapped batch of independent registrations, sharded across
    devices (scan pairs in odometry batches, submap constraint pairs,
    localization hypothesis groups, dataset sequences);
  * ``block`` — the source cloud of each registration split into point
    shards; every GN iteration each device gathers correspondences for its
    shard and the 6x6 normal equations are psum-reduced over ICI, so all
    devices step the identical pose.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open3d_slam_tpu.ops import pallas_icp, registration as reg_ops
from open3d_slam_tpu.ops.hashgrid import HashGrid
from open3d_slam_tpu.utils.pointcloud import PointCloud


def batched_icp_p2l(sources: PointCloud, grids: HashGrid, inits: jnp.ndarray,
                    max_correspondence_distance, max_iterations: int = 30,
                    bucket_size: int = 16) -> reg_ops.RegistrationResult:
    """Point-to-plane ICP over a leading batch axis.

    All of ``sources``/``grids``/``inits`` carry a leading batch dim; shard
    them over the mesh 'data' axis (parallel.mesh.shard_batch) and jit does
    the rest — each device runs its share of registrations.

    On TPU this lowers to the natively-batched fused Pallas kernel (one
    kernel call per GN iteration for the whole batch — vmapping pallas_call
    compiles pathologically on some runtimes, so batching lives in the
    kernel grid instead).  Elsewhere it vmaps the probe-NN solver.
    """
    m = sources.points.shape[-2]
    n = grids.points_sorted.shape[-2]
    if (jax.default_backend() == "tpu" and grids.normals_sorted is not None
            and pallas_icp.supports(m, n)):
        return reg_ops.batched_icp_point_to_plane(
            sources, grids, inits, max_correspondence_distance,
            max_iterations=max_iterations)
    fn = lambda s, g, T0: reg_ops.icp_point_to_plane(
        s, g, T0, max_correspondence_distance,
        max_iterations=max_iterations, bucket_size=bucket_size,
        nn_method="bruteforce" if jax.default_backend() == "tpu" else "probe")
    return jax.vmap(fn)(sources, grids, inits)


def make_block_sharded_icp(mesh: Mesh, max_correspondence_distance,
                           max_iterations: int = 30, bucket_size: int = 16):
    """Correspondence-block-sharded single registration over the 'block' axis.

    Returns a jitted fn(source_shards, grid, init) where ``source_shards``
    has its POINT axis pre-split into [n_block, points/n_block]; the target
    grid is replicated.  Inside, each device computes its shard's JtJ/Jtr
    and they are psum-reduced every GN iteration.
    """
    from jax import shard_map

    n_block = mesh.shape["block"]

    def inner(source: PointCloud, grid: HashGrid, init: jnp.ndarray):
        # source leaves arrive with leading axis n_block stripped to the
        # local shard (shape [1, ...] per device) by shard_map; drop it.
        src_local = jax.tree_util.tree_map(lambda x: x[0], source)
        res = reg_ops.icp_point_to_plane(
            src_local, grid, init, max_correspondence_distance,
            max_iterations=max_iterations, bucket_size=bucket_size,
            axis_name="block")
        return res

    sharded = shard_map(
        inner, mesh=mesh,
        in_specs=(P("block"), P(), P()),
        out_specs=P(),
        check_vma=False)

    @jax.jit
    def run(source_shards: PointCloud, grid: HashGrid, init: jnp.ndarray):
        return sharded(source_shards, grid, init)

    return run


def split_points_for_blocks(pc: PointCloud, n_block: int) -> PointCloud:
    """Reshape a cloud's point axis into [n_block, N/n_block] shards."""
    n = pc.capacity
    assert n % n_block == 0, f"capacity {n} not divisible by {n_block} blocks"

    def rs(x):
        return None if x is None else x.reshape(n_block, n // n_block, *x.shape[1:])

    return PointCloud(points=rs(pc.points), mask=rs(pc.mask),
                      normals=rs(pc.normals), colors=rs(pc.colors))
