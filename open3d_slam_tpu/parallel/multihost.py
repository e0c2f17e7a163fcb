"""Multi-host scale-out harness (BASELINE config 5).

The reference is single-process (SURVEY §2.4); this module is the N-host
axis the TPU build adds: N sequences of batch mapping sharded across
processes, device-level collectives riding ICI within a host/slice and DCN
across hosts, and a final pose-graph refinement stage.

Structure:
  * ``initialize`` — ``jax.distributed.initialize`` wrapper (coordinator /
    process count / process id from args or env).  After it returns,
    ``jax.devices()`` is the GLOBAL device list.
  * ``global_mesh`` — (data, block) mesh over all global devices; the same
    shard_map/psum code from parallel/sharded_icp.py then reduces over
    ICI+DCN with zero changes.
  * ``batch_map_sequences`` — each process SLAM-maps its round-robin share
    of sequences (odometry/mapping are host-driven device programs), then
    all trajectories are exchanged with ``process_allgather``.
  * ``registration_throughput_stage`` — the cross-process device benchmark:
    a globally-sharded batch of point-to-plane registrations whose per-shard
    6x6 JtJ/Jtr are psum-reduced over the global mesh (the BASELINE
    north-star decomposition).
  * ``pose_graph_refinement_stage`` — batched pose-graph LM over all
    sequences' graphs, sharded on the global data axis.

Run locally as a 2-process demonstration (what ``dryrun_multichip``'s
sibling test does):

    python -m open3d_slam_tpu.parallel.multihost --spawn 2

which forks 2 processes x 4 virtual CPU devices, runs all stages, and
prints ``multihost: PASS`` from process 0.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed (idempotent for single-process runs).

    Returns this process's id.  Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars;
    with no configuration at all this is a no-op single-process setup.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return process_id


def global_mesh(block: int = 1):
    """(data, block) mesh over ALL global devices (call after initialize)."""
    import jax
    from open3d_slam_tpu.parallel import mesh as mesh_lib

    n = len(jax.devices())
    assert n % block == 0, (n, block)
    return mesh_lib.make_mesh((n // block, block))


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


def batch_map_sequences(sequences, params=None) -> List[np.ndarray]:
    """Map N sequences, sharded round-robin across processes.

    Each process runs full SLAM (odometry + mapping) on sequences
    [process_id::num_processes] using its LOCAL devices, then trajectories
    are allgathered so every process returns the full N-sequence result
    (fixed-size padded pose arrays — multihost allgather needs equal shapes).
    """
    import jax
    from jax.experimental import multihost_utils
    from open3d_slam_tpu.models.slam_wrapper import SlamWrapper
    from open3d_slam_tpu.utils.config import SlamParameters

    pid = jax.process_index()
    nproc = jax.process_count()
    n_seq = len(sequences)
    max_len = max(len(s.scans) for s in sequences)

    local = np.zeros((n_seq, max_len, 4, 4), np.float32)
    owned = np.zeros((n_seq,), np.float32)
    for i in range(pid, n_seq, nproc):
        seq = sequences[i]
        slam = SlamWrapper(params or SlamParameters())
        for scan, t in zip(seq.scans, seq.timestamps):
            slam.process_scan(scan, t)
        _, poses = slam.get_trajectory()
        for j, T in enumerate(poses[:max_len]):
            local[i, j] = T
        owned[i] = 1.0
    if nproc > 1:
        # Each sequence is owned by exactly one process (round-robin), so a
        # plain sum over the allgathered per-process arrays merges them.
        local = np.asarray(multihost_utils.process_allgather(local)).sum(0)
    return [local[i] for i in range(n_seq)]


def batch_map_stage(n_sequences: int = 2, n_scans: int = 6) -> dict:
    """BASELINE config-5 sanity: run ``batch_map_sequences`` on N tiny
    synthetic sequences, round-robin across the live processes, and check
    every process receives all N trajectories with the owned poses intact.

    Returns {"n_sequences", "n_nonzero", "max_start_err"} (process-local;
    identical on every process by construction of the allgather).
    """
    from open3d_slam_tpu.io import datasets
    from open3d_slam_tpu.utils.config import CapacityParameters, SlamParameters

    seqs = []
    for i in range(n_sequences):
        cfgw = datasets.SyntheticWorldConfig(
            extent=20.0, n_ground=20000, n_walls=15000, n_pillars=8000,
            seed=11 + i)
        seqs.append(datasets.make_synthetic_sequence(
            n_scans=n_scans, trajectory="straight", step=0.4, n_points=3000,
            max_range=18.0, world_cfg=cfgw))

    params = SlamParameters()
    params.capacities = CapacityParameters(
        raw_scan=4096, processed_scan=2048, submap_points=16384,
        dense_submap_voxels=4096, map_patch=4096, feature_cloud=1024)
    params.odometry.scan_processing.voxel_size = 0.4
    params.mapper.scan_processing.voxel_size = 0.4
    params.mapper.map_builder.map_voxel_size = 0.4
    params.mapper.is_build_dense_map = False
    params.mapper.is_attempt_loop_closures = False

    trajs = batch_map_sequences(seqs, params)
    n_nonzero = sum(1 for t in trajs if np.abs(t).sum() > 0)
    # Each trajectory's first pose is ~identity (mapping starts at origin).
    max_start_err = max(
        float(np.abs(t[0] - np.eye(4)).max()) for t in trajs
        if np.abs(t).sum() > 0) if n_nonzero else float("inf")
    return {"n_sequences": n_sequences, "n_nonzero": n_nonzero,
            "max_start_err": max_start_err}


def registration_throughput_stage(mesh, batch: int = 32, n_src: int = 512,
                                  n_tgt: int = 2048) -> float:
    """Globally-sharded batched p2l ICP; returns mean fitness (must be ~1).

    The batch is sharded over the global 'data' axis (spanning processes);
    each registration's GN iterations run on one device, so the work scales
    linearly with total devices.  With block>1 meshes, sharded_icp's psum
    path reduces JtJ over ICI/DCN.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from open3d_slam_tpu.ops import hashgrid, normals as normals_ops
    from open3d_slam_tpu.parallel import sharded_icp
    from open3d_slam_tpu.utils.pointcloud import PointCloud

    rng = np.random.default_rng(0)  # same on every process (global arrays)
    tgts, srcs = [], []
    for b in range(batch):
        r = np.random.default_rng(b)
        t = np.stack([r.uniform(-8, 8, n_tgt), r.uniform(-8, 8, n_tgt),
                      0.05 * r.standard_normal(n_tgt)], axis=1).astype(np.float32)
        s = t[r.choice(n_tgt, n_src, replace=False)] + np.array(
            [0.1, -0.05, 0.02], np.float32)
        tgts.append(t)
        srcs.append(s)
    src_pc = PointCloud(points=jnp.asarray(np.stack(srcs)),
                        mask=jnp.ones((batch, n_src), bool))
    tgt_pc = PointCloud(points=jnp.asarray(np.stack(tgts)),
                        mask=jnp.ones((batch, n_tgt), bool))
    tgt_pc = jax.vmap(lambda p: normals_ops.estimate_normals(p, 1.0, max_nn=10))(tgt_pc)
    grids = jax.vmap(lambda p: hashgrid.build(p, 0.8))(tgt_pc)
    inits = jnp.tile(jnp.eye(4), (batch, 1, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    # Global arrays from replicated host data.
    src_pc = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), src_pc)
    grids = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), grids)
    inits = jax.device_put(inits, sh)
    def run(s, g, T0):
        res = sharded_icp.batched_icp_p2l(s, g, T0, 0.8, max_iterations=10)
        # Reduce in-jit: the scalar output is replicated, hence addressable
        # on every process.
        return jnp.mean(res.fitness)

    with jax.set_mesh(mesh):
        fit = jax.jit(run)(src_pc, grids, inits)
    return float(fit)


def pose_graph_refinement_stage(mesh, n_graphs: int = 8, n_nodes: int = 16) -> float:
    """Batched pose-graph LM sharded over the global data axis.

    Returns the max post-optimization endpoint error over all graphs (drifted
    chains + a perfect loop closure each; must be ~0).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from open3d_slam_tpu.ops import pose_graph as pg

    def make_graph(seed):
        drift = 0.1
        nodes = [np.eye(4, dtype=np.float32)]
        for i in range(1, n_nodes):
            T = nodes[-1].copy()
            T[:3, 3] = nodes[-1][:3, 3] + [0.0, 1.0 + drift, 0.0]
            nodes.append(T)
        E = n_nodes  # n-1 odometry + 1 loop closure
        src = np.array([i for i in range(n_nodes - 1)] + [0], np.int32)
        tgt = np.array([i + 1 for i in range(n_nodes - 1)] + [n_nodes - 1], np.int32)
        Te = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        for i in range(n_nodes - 1):
            Te[i, 1, 3] = 1.0 + drift
        Te[-1, 1, 3] = float(n_nodes - 1)          # true relative pose
        info = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
        info[-1] *= 10.0
        unc = np.zeros(E, bool)
        unc[-1] = True
        return pg.PoseGraphData(
            node_poses=jnp.asarray(np.stack(nodes)),
            node_mask=jnp.ones((n_nodes,), bool),
            edge_source=jnp.asarray(src), edge_target=jnp.asarray(tgt),
            edge_transform=jnp.asarray(Te), edge_information=jnp.asarray(info),
            edge_uncertain=jnp.asarray(unc), edge_mask=jnp.ones((E,), bool))

    graphs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[make_graph(i) for i in range(n_graphs)])
    sh = NamedSharding(mesh, P("data"))
    graphs = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), graphs)
    def solve(gs):
        X = jax.vmap(
            lambda g: pg.optimize(g, 10.0, 2.0, 0.25, 0, max_iterations=20)[0])(gs)
        return jnp.max(jnp.abs(X[:, -1, 1, 3] - (n_nodes - 1)))

    with jax.set_mesh(mesh):
        err = jax.jit(solve)(graphs)
    return float(err)


# ---------------------------------------------------------------------------
# Demonstration driver
# ---------------------------------------------------------------------------


def _worker_main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spawn", type=int, default=0,
                    help="fork N local processes (CPU demo) and run all stages")
    ap.add_argument("--coordinator", default="localhost:12763")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--block", type=int, default=1)
    ap.add_argument("--out", default=None, help="write a JSON PASS artifact")
    args = ap.parse_args(argv)

    if args.spawn:
        return _spawn_local(args)

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The axon sitecustomize force-registers the TPU backend regardless
        # of JAX_PLATFORMS; override at the config level (must run before
        # backend init).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices_per_process)
    pid = initialize(args.coordinator, args.num_processes, args.process_id)
    mesh = global_mesh(block=args.block)
    fit = registration_throughput_stage(mesh)
    err = pose_graph_refinement_stage(mesh)
    bm = batch_map_stage()
    ok = (fit > 0.95 and err < 0.05
          and bm["n_nonzero"] == bm["n_sequences"]
          and bm["max_start_err"] < 1e-3)
    if jax.process_index() == 0:
        result = {"processes": jax.process_count(),
                  "global_devices": len(jax.devices()),
                  "mesh": dict(mesh.shape),
                  "registration_fitness": round(fit, 4),
                  "pose_graph_endpoint_err": round(err, 5),
                  "batch_map_sequences": bm,
                  "ok": ok}
        print(json.dumps(result))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f)
        print("multihost: PASS" if ok else "multihost: FAIL")
    return 0 if ok else 1


def _spawn_local(args):
    """Fork N local CPU processes and run the worker in each."""
    import subprocess

    procs = []
    for pid in range(args.spawn):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{args.devices_per_process}").strip()
        cmd = [sys.executable, "-m", "open3d_slam_tpu.parallel.multihost",
               "--coordinator", args.coordinator,
               "--num-processes", str(args.spawn),
               "--process-id", str(pid),
               "--block", str(args.block)]
        if args.out and pid == 0:
            cmd += ["--out", args.out]
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    return max(rcs)


if __name__ == "__main__":
    sys.exit(_worker_main())
