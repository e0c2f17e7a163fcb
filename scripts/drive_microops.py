"""Micro-timings of the per-scan device programs at deployed vlp16 shapes.

One process, warm cache, hard syncs via tiny device_get.  Guides the
device-work cuts: preprocess internals (voxelize / kNN prepass / moments),
submap insert at alternative capacities, scan2map patch prep + GICP.
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


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s}: {dt:7.2f} ms", flush=True)
    return out


def main():
    from open3d_slam_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    t0 = time.monotonic()
    np.asarray(jnp.arange(8))
    print(f"session acquired in {time.monotonic() - t0:.1f} s", flush=True)

    from open3d_slam_tpu.ops import (hashgrid, normals as normals_ops,
                                     pallas_normals, sorted_store, voxel)
    from open3d_slam_tpu.ops import croppers
    from open3d_slam_tpu.utils import pointcloud as pclib

    rng = np.random.default_rng(0)

    # vlp16 odometry preprocess shapes: raw 32768 -> processed 16384.
    raw = rng.uniform(-25, 25, (32768, 3)).astype(np.float32)
    raw[:, 2] = np.abs(raw[:, 2]) * 0.15
    raw_pc = pclib.from_numpy(raw, capacity=32768)
    crop = croppers.CroppingVolume(max_radius=jnp.float32(30.0),
                                   min_radius=jnp.float32(2.0))
    cropped = timeit("crop 32k", jax.jit(lambda p: crop.crop(p)), raw_pc)
    down = timeit("voxel_downsample 32k->16384 @0.05",
                  jax.jit(lambda p: voxel.voxel_downsample(
                      p, 0.05, out_capacity=16384)), cropped)
    for chunk in (512, 1024, 2048):
        timeit(f"kth_neighbor_d2 16k k=20 chunk={chunk}",
               jax.jit(lambda p, m: pallas_normals.kth_neighbor_d2(
                   p, m, 20, chunk=chunk)), down.points, down.mask)
    dk2 = pallas_normals.kth_neighbor_d2(down.points, down.mask, 20)
    r_pp = pallas_normals.hybrid_radius(3.0, dk2)
    timeit("radius_moments 16k",
           jax.jit(lambda p, m, r: pallas_normals.radius_moments(p, m, r)),
           down.points, down.mask, r_pp)
    timeit("estimate_normals 16k (full)",
           jax.jit(lambda p: normals_ops.estimate_normals(p, 3.0, max_nn=20)),
           down)
    timeit("prep_target grid 16k",
           jax.jit(lambda p: hashgrid.build(p, 0.8)),
           normals_ops.estimate_normals(down, 3.0, max_nn=20))

    # Submap insert at capacities.
    for C in (262144, 163840, 131072):
        mpts = rng.uniform(-30, 30, (C, 3)).astype(np.float32)
        map_pc = pclib.from_numpy(mpts, capacity=C)
        scan_pc = pclib.from_numpy(
            rng.uniform(-20, 20, (16384, 3)).astype(np.float32),
            capacity=16384)
        mb_crop = croppers.CroppingVolume(max_radius=jnp.float32(25.0))
        timeit(f"insert_scan_fused C={C}",
               jax.jit(lambda m, s: sorted_store.insert_scan_fused(
                   m, s, jnp.eye(4), mb_crop, 0.1, jnp.asarray(True))),
               map_pc, scan_pc)


if __name__ == "__main__":
    main()
