import time
import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_tpu.io import datasets
from open3d_slam_tpu.ops import normals as normals_ops
from open3d_slam_tpu.utils import pointcloud as pclib

def log(*a): print(f"[{time.perf_counter()-T0:6.1f}s]", *a, flush=True)
T0 = time.perf_counter()

n_map = 65536
world = datasets.SyntheticWorld(datasets.SyntheticWorldConfig(
    extent=35.0, n_ground=120000, n_walls=60000, n_pillars=40000))
T = np.eye(4); T[:3, 3] = [5.0, 3.0, 1.5]
map_scan = world.render_scan(T, max_range=35.0, n_points=n_map)
map_pc = pclib.from_numpy(map_scan, capacity=n_map)

f_flash = jax.jit(lambda p: normals_ops.estimate_normals(p, 1.0, max_nn=10, method="flash"))
f_probe = jax.jit(lambda p: normals_ops.estimate_normals(p, 1.0, max_nn=10, method="probe"))

out_f = f_flash(map_pc); jax.block_until_ready(out_f.normals)
log("flash compiled")
nf = np.asarray(out_f.normals)
out_p = f_probe(map_pc); jax.block_until_ready(out_p.normals)
log("probe compiled")
np_ = np.asarray(out_p.normals)
dot = np.abs((nf * np_).sum(1))
log("normal agreement: median |dot|", np.median(dot), "frac>0.99:", (dot > 0.99).mean(), "frac>0.9:", (dot > 0.9).mean())

def timeit(f, reps=5):
    o = f(map_pc); jax.block_until_ready(o.normals); np.asarray(o.normals[0])
    t0 = time.perf_counter()
    for _ in range(reps): o = f(map_pc)
    jax.block_until_ready(o.normals); np.asarray(o.normals[0])
    return (time.perf_counter()-t0)/reps*1e3

log("flash ms:", timeit(f_flash))
log("probe ms:", timeit(f_probe, reps=2))

# scan-sized
scan = world.render_scan(T, max_range=25.0, n_points=8192)
spc = pclib.from_numpy(scan, capacity=8192)
f_flash_s = jax.jit(lambda p: normals_ops.estimate_normals(p, 1.0, max_nn=10, method="flash"))
o = f_flash_s(spc); jax.block_until_ready(o.normals)
t0 = time.perf_counter()
for _ in range(10): o = f_flash_s(spc)
jax.block_until_ready(o.normals); np.asarray(o.normals[0])
log("flash 8k ms:", (time.perf_counter()-t0)/10*1e3)
