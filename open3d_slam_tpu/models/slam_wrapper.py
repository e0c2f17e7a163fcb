"""SlamWrapper: the end-to-end SLAM orchestrator.

Mirror of the reference's ``SlamWrapper`` (``src/SlamWrapper.cpp:43-487``),
re-architected from 4 racing worker threads to a sequential, deterministic
host pipeline feeding jitted device stages (SURVEY §7 "threads -> stages"):

  reference thread              -> pipeline stage (same gate order)
  ------------------------------------------------------------------
  odometryWorker (:258-289)     -> _odometry_step
  mappingWorker (:290-347)      -> _mapping_step (+ feature/LC dispatch)
  denseMapWorker (:363-386)     -> _dense_map_step
  loopClosureWorker (:406-448)  -> _loop_closure_step
  updateSubmapsAndTrajectory (:450-485) -> apply_optimized_graph

Ingest semantics preserved: NaN removal + out-of-order rejection on
``add_range_scan`` (:102-115), buffer-full backpressure hooks for offline
replay, finishProcessing's final submap + loop-closure round (:126-166),
map/submap saving (:65-78, :242-256), and the 15 s timing telemetry
(:282-286, :340-344, :379-383).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from open3d_slam_tpu.models.buffers import CircularBuffer
from open3d_slam_tpu.models.constraints import (Constraint,
                                                compute_odometry_constraints)
from open3d_slam_tpu.models.mapper import Mapper
from open3d_slam_tpu.models.odometry import LidarOdometry
from open3d_slam_tpu.models.optimization import OptimizationProblem
from open3d_slam_tpu.models.place_recognition import PlaceRecognition
from open3d_slam_tpu.models.submap_collection import SubmapCollection
from open3d_slam_tpu.ops import motion_compensation as mc_ops
from open3d_slam_tpu.utils import pointcloud as pclib
from open3d_slam_tpu.utils.config import SlamParameters
from open3d_slam_tpu.utils.timeutil import TelemetryRegistry

import jax.numpy as jnp


class TimestampedPointCloud:
    __slots__ = ("time", "cloud", "odom_pending")

    def __init__(self, time, cloud, odom_pending=None):
        self.time = time
        self.cloud = cloud
        self.odom_pending = odom_pending   # OdometryPending riding along


class SlamWrapper:
    def __init__(self, params: Optional[SlamParameters] = None):
        self.params = params or SlamParameters()
        p = self.params
        cap = p.capacities
        self.telemetry = TelemetryRegistry(
            enabled=p.mapper.is_print_timing_statistics)

        self.odometry = LidarOdometry(p.odometry,
                                      processed_capacity=cap.processed_scan)
        self.submaps = SubmapCollection(
            p.mapper, map_capacity=cap.submap_points,
            dense_capacity=cap.dense_submap_voxels,
            feature_capacity=cap.feature_cloud)
        self.mapper = Mapper(p.mapper, self.odometry.odom_buffer, self.submaps,
                             processed_capacity=cap.processed_scan,
                             patch_capacity=cap.map_patch)
        self.optimization_problem = OptimizationProblem(
            p.mapper, max_nodes=cap.max_submaps, max_edges=cap.max_constraints)
        self.place_recognition = PlaceRecognition(p.mapper)
        self.submaps.place_recognition = self.place_recognition

        self.odometry_buffer: CircularBuffer = CircularBuffer(
            max(1, p.odometry.odometry_buffer_size))
        self.mapping_buffer: CircularBuffer = CircularBuffer(
            max(1, p.mapper.mapping_buffer_size))
        self.loop_closure_candidates: List = []
        self.odometry_constraints: List[Constraint] = []
        self.last_loop_closure_constraints: List[Constraint] = []
        self.num_latest_loop_closure_constraints = -1
        self.is_optimized_graph_available = False
        # health counters surfaced in the CLI eval JSON
        self.n_loop_closures_accepted = 0
        self.n_optimizations_applied = 0
        self.latest_scan_to_map_refinement_time: Optional[float] = None
        self.folder_path = "."
        self._raw_capacity = cap.raw_scan
        # in-flight pipelined mapping step: (MapperPending, measurement, cloud)
        self._map_pending = None
        self._lc_job = None          # in-flight loop-closure job
        self._pending_constraint_pulls: List = []   # dispatched, unpulled

    # ------------------------------------------------------------------
    # Ingest (SlamWrapper::addRangeScan, :102-115)

    def add_range_scan(self, points: np.ndarray, timestamp: float,
                       colors: Optional[np.ndarray] = None) -> bool:
        """Ingest one scan; optional per-point RGB in [0,1] is carried to the
        dense map (the reference ingests colors via ``rosToOpen3d``,
        ``open3d_conversions.cpp:60-95``, aggregated at ``Voxel.cpp:33-36``)."""
        finite = np.isfinite(points).all(axis=1)
        points = points[finite]
        if colors is not None:
            colors = np.asarray(colors, np.float32)[finite]
        back = self.odometry_buffer.peek_back()
        if back is not None and timestamp < back.time:
            print("you are trying to add a range scan out of order! Dropping!")
            return False
        cloud = pclib.from_numpy(points.astype(np.float32),
                                 capacity=self._raw_capacity, colors=colors)
        self.odometry_buffer.push(TimestampedPointCloud(timestamp, cloud))
        return True

    def is_odometry_buffer_full(self) -> bool:
        return self.odometry_buffer.full()

    def is_mapping_buffer_full(self) -> bool:
        return self.mapping_buffer.full()

    # ------------------------------------------------------------------
    # Stages

    def _undistort(self, measurement: TimestampedPointCloud, which: str):
        p = self.params.motion_compensation
        if not p.is_undistort_input_cloud:
            return measurement.cloud
        buf = (self.odometry.odom_buffer if which == "odom"
               else self.mapper.map_to_range_sensor_buffer)
        if len(buf) <= p.num_poses_velocity_estimation:
            return measurement.cloud
        finish = buf.latest_measurement(0)
        start = buf.latest_measurement(p.num_poses_velocity_estimation)
        dt = finish.time - start.time
        if dt <= 0:
            return measurement.cloud
        lin, ang = mc_ops.estimate_velocities(
            jnp.asarray(start.transform, jnp.float32),
            jnp.asarray(finish.transform, jnp.float32), dt)
        return mc_ops.undistort_constant_velocity(
            measurement.cloud, lin, ang, p.scan_duration,
            is_spinning_clockwise=p.is_spinning_clockwise)

    def _odometry_step(self) -> bool:
        """odometryWorker body (:258-289).

        Dispatch-only: device results ride the measurement into the mapping
        stage as an ``OdometryPending`` and are pulled there in ONE
        device->host round-trip together with the scan-to-map scalars.
        """
        measurement = self.odometry_buffer.pop()
        if measurement is None:
            return False
        with self.telemetry.timer("odometry", sampled=True) as t:
            cloud = self._undistort(measurement, "odom")
            r = self.odometry.add_range_scan_async(cloud, measurement.time)
            if t.recording and self.odometry.prev is not None:
                # attribute target prep + registration to this stage on
                # SAMPLED invocations (sync costs a tunnel RTT)
                self.telemetry.sync(self.odometry.prev.grid.hashes_sorted)
                if not isinstance(r, bool):
                    self.telemetry.sync(r.fitness)
        measurement.odom_pending = None if isinstance(r, bool) else r
        if r is False:
            print(f"WARNING: odometry dropped scan at t={measurement.time}; "
                  "pose not updated for this scan")
        self.mapping_buffer.push(measurement)
        self.telemetry.maybe_print()
        return True

    def _mapping_step(self) -> bool:
        """mappingWorker body (:290-347): dispatch + immediate finalize."""
        flushed = self._flush_map_pending()
        measurement = self.mapping_buffer.pop()
        if measurement is None:
            return flushed
        with self.telemetry.timer("mapping", sampled=True) as t:
            cloud = self._undistort(measurement, "map")
            mp, _ = self.mapper.dispatch_range_measurement(
                cloud, measurement.time,
                odom_pending=measurement.odom_pending)
            if mp is not None:
                self.mapper.finalize_range_measurement(mp)
            # Attribute the async submap-insert program to THIS stage on
            # sampled invocations (see TelemetryRegistry.sync).
            if t.recording:
                self.telemetry.sync(self.submaps.get_active_submap().map_cloud)
        self.latest_scan_to_map_refinement_time = measurement.time
        self._post_mapping_stages(measurement, cloud)
        return True

    def _post_mapping_stages(self, measurement: TimestampedPointCloud, cloud):
        """Stages downstream of the mapper per scan: dense map, feature
        computation, loop closures, optimized-graph application."""
        # Dense map stage (denseMapWorker, :363-386).
        if self.params.mapper.is_build_dense_map:
            with self.telemetry.timer("dense_map", sampled=True) as t:
                self.submaps.insert_scan_dense_map(
                    cloud, self.mapper.map_to_range_sensor, measurement.time)
                if t.recording:
                    self.telemetry.sync(self.submaps.get_active_submap().dense_map.keys)
        # Feature computation + loop-closure candidate collection (:388-405).
        if self.params.mapper.is_attempt_loop_closures:
            self.compute_features_if_ready()
            self.attempt_loop_closures_if_ready()
        self.check_if_optimized_graph_available()
        self.telemetry.maybe_print()

    def _flush_map_pending(self) -> bool:
        """Finalize the in-flight pipelined mapping step, if any."""
        if self._map_pending is None:
            return False
        mp, measurement, cloud = self._map_pending
        self._map_pending = None
        with self.telemetry.timer("mapping", sampled=True) as t:
            self.mapper.finalize_range_measurement(mp)
            if t.recording:
                self.telemetry.sync(self.submaps.get_active_submap().map_cloud)
        self.latest_scan_to_map_refinement_time = measurement.time
        self._post_mapping_stages(measurement, cloud)
        return True

    def compute_features_if_ready(self):
        finished = self.submaps.pop_finished_submap_ids()
        if finished:
            with self.telemetry.timer("submap_features"):
                self.submaps.compute_features(finished)
            with self.telemetry.timer("odometry_constraints"):
                # Dispatch-only: the (T, info) outputs ride prefetched
                # transfers and are filled in when an optimization round
                # actually reads the constraints.
                compute_odometry_constraints(
                    self.submaps, self.odometry_constraints,
                    candidates=finished,
                    pending_out=self._pending_constraint_pulls)

    def _flush_pending_constraints(self):
        from open3d_slam_tpu.models.constraints import finalize_constraint
        pend, self._pending_constraint_pulls = \
            self._pending_constraint_pulls, []
        for c, outputs in pend:
            finalize_constraint(c, outputs)

    def attempt_loop_closures_if_ready(self):
        cands = self.submaps.pop_loop_closure_candidates()
        if cands:
            self.loop_closure_candidates.extend(cands)
        self._advance_loop_closures()

    def _advance_loop_closures(self, drain: bool = False):
        """loopClosureWorker (:406-448) as a resumable state machine.

        The reference's closure detection runs in a worker thread
        concurrent with scan processing; here each call advances the
        in-flight job by ONE phase (batched-RANSAC dispatch -> gate +
        refine dispatch -> gate + constraints), with every phase's device
        outputs prefetched so the pull a scan later is ~free.  The replay
        loop therefore never host-blocks on closure device work.  With
        ``drain`` (finishProcessing / sequential mode) the machine runs to
        completion.
        """
        while True:
            if self._lc_job is None:
                if (not self.loop_closure_candidates or
                        self.is_optimized_graph_available):
                    return
                tid = self.loop_closure_candidates.pop(0)
                with self.telemetry.timer("lc_start"):
                    self._lc_job = self.place_recognition.start_loop_closure_job(
                        self.submaps.map_to_range_sensor, self.submaps,
                        self.submaps.adjacency, tid.submap_id,
                        self.submaps.active_submap_idx, tid.time)
                if self._lc_job is None:
                    self.num_latest_loop_closure_constraints = 0
                    continue        # nothing to match; try next candidate
                if not drain:
                    return
            if not drain and not self._lc_outputs_ready(self._lc_job):
                return          # device still crunching; try next scan
            with self.telemetry.timer("lc_" + self._lc_job.phase):
                done = self.place_recognition.advance_loop_closure_job(
                    self._lc_job)
            if done:
                job, self._lc_job = self._lc_job, None
                self._finish_loop_closure(job.constraints)
            if not drain:
                return

    @staticmethod
    def _lc_outputs_ready(job) -> bool:
        """True when the in-flight phase's device outputs have landed — a
        phase advance then costs ~nothing.  Backends without is_ready()
        report ready (the pull blocks as before)."""
        try:
            if job.phase == "ransac":
                return job.ransac_res.num_inliers.is_ready()
            return all(out[0].is_ready() for _, out in job.refines)
        except AttributeError:
            return True

    def _finish_loop_closure(self, constraints: List[Constraint]):
        """Post-detection half of loopClosureWorker (:427-448): odometry
        constraints + pose-graph build/solve."""
        self.num_latest_loop_closure_constraints = len(constraints)
        if not constraints:
            return
        self.n_loop_closures_accepted += len(constraints)
        with self.telemetry.timer("optimization"):
            self._flush_pending_constraints()
            odom_constraints = list(self.odometry_constraints)
            compute_odometry_constraints(self.submaps, odom_constraints)
            self.optimization_problem.clear_odometry_constraints()
            self.optimization_problem.insert_loop_closure_constraints(constraints)
            self.optimization_problem.insert_odometry_constraints(odom_constraints)
            self.optimization_problem.build_optimization_problem(self.submaps)
            if self.params.mapper.is_dump_submaps_to_file_before_and_after_loop_closures:
                self.dump_submaps("before")
                self.optimization_problem.dump_to_file(
                    os.path.join(self.folder_path, "poseGraph.json"))
            self.optimization_problem.solve()
            self.last_loop_closure_constraints = constraints
            self.is_optimized_graph_available = True

    def check_if_optimized_graph_available(self):
        """(:421-432 / :349-361)."""
        if self.is_optimized_graph_available:
            self.is_optimized_graph_available = False
            self.update_submaps_and_trajectory()
            if self.params.mapper.is_dump_submaps_to_file_before_and_after_loop_closures:
                self.dump_submaps("after")

    def update_submaps_and_trajectory(self):
        """``updateSubmapsAndTrajectory`` (:450-485)."""
        self.n_optimizations_applied += 1
        increments = self.optimization_problem.get_optimized_transform_increments()
        self.submaps.transform(increments)
        if self.last_loop_closure_constraints:
            latest = max(self.last_loop_closure_constraints,
                         key=lambda c: (c.timestamp or 0.0))
            assert latest.source_submap_idx > latest.target_submap_idx
            dT = increments[latest.source_submap_idx].dT
            self.mapper.loop_closure_update(dT)
        # Zero out applied loop-closure constraints (:473-480).
        for i, c in enumerate(self.optimization_problem.loop_closure_constraints):
            c.source_to_target = np.eye(4)
        self.submaps.update_adjacency_matrix(
            self.optimization_problem.loop_closure_constraints)

    # ------------------------------------------------------------------
    # Driving

    def process_queued(self) -> int:
        """Run stages until all queues drain; returns #scans processed."""
        n = 0
        while True:
            did_odo = self._odometry_step()
            did_map = self._mapping_step()
            if did_map:
                n += 1
            if not (did_odo or did_map):
                break
        return n

    def process_scan(self, points: np.ndarray, timestamp: float,
                     colors: Optional[np.ndarray] = None) -> bool:
        """Convenience: ingest + drain (sequential online mode)."""
        if not self.add_range_scan(points, timestamp, colors=colors):
            return False
        return self.process_queued() > 0

    def process_scan_pipelined(self, points: np.ndarray, timestamp: float,
                               colors: Optional[np.ndarray] = None) -> bool:
        """Pipelined ingest: one scan in flight across stage boundaries.

        The reference overlaps its stages with racing worker threads
        (``SlamWrapper.cpp:228-234``); on one chip every device program
        executes serially anyway, so the only real overlap to win is hiding
        the blocking per-scan device->host pull (a full tunnel round-trip)
        and the host bookkeeping behind device compute.  Per call, in order:

          1. ingest scan t, dispatch its odometry (queued on device);
          2. dispatch scan t's pose-independent mapper preprocessing;
          3. finalize scan t-1's mapping (the ONE blocking pull — its
             transfer latency now overlaps the device executing 1+2);
          4. dispatch scan t's scan-to-map registration (after t-1's submap
             insert, so the map patch is current).

        Gate order, math, and rng sequence are identical to the sequential
        mode; the single behavioral difference is that motion-compensation
        velocity estimates use the poses available at DISPATCH time (one
        scan staler), exactly like the reference's free-running undistort
        thread reading whatever the pose buffer holds when it pops a scan
        (``MotionCompensation.cpp:32-57``).

        Call ``finish_processing`` (which drains the in-flight step) before
        reading trajectories/maps.
        """
        if not self.add_range_scan(points, timestamp, colors=colors):
            return False
        self._odometry_step()
        measurement = self.mapping_buffer.pop()
        if measurement is None:
            return True
        cloud = self._undistort(measurement, "map")
        processed = None
        if not self.submaps.get_active_submap().is_empty():
            # Phase A (pose-independent prep) rides ahead of the previous
            # scan's finalize pull.  First-scan path handles its own prep.
            processed = self.mapper.preprocess_scan(cloud)
        self._flush_map_pending()
        mp, _ = self.mapper.dispatch_range_measurement(
            cloud, measurement.time, odom_pending=measurement.odom_pending,
            processed=processed)
        if mp is not None:
            self._map_pending = (mp, measurement, cloud)
        else:
            self.latest_scan_to_map_refinement_time = measurement.time
            self._post_mapping_stages(measurement, cloud)
        return True


    def finish_processing(self):
        """``finishProcessing`` (:126-166): drain, force final submap, run a
        final feature/loop-closure/optimization round."""
        self.process_queued()
        # Resolve any odometry results whose mapping step never ran (e.g.
        # a measurement dropped on buffer overflow in async mode).
        self.odometry.finalize_pending()
        print("Finishing all submaps!")
        self.num_latest_loop_closure_constraints = -1
        self.submaps.force_new_submap_creation()
        if self.params.mapper.is_attempt_loop_closures:
            self.compute_features_if_ready()
            cands = self.submaps.pop_loop_closure_candidates()
            if cands:
                self.loop_closure_candidates.extend(cands)
            self._advance_loop_closures(drain=True)
            self.check_if_optimized_graph_available()
        self._flush_pending_constraints()
        self.telemetry.maybe_print(force=True)
        print("All submaps finished!")

    # ------------------------------------------------------------------

    def warmup(self, scans=None, timestamps=None):
        """Compile/load the device programs before replay starts.

        The per-finished-submap programs (features, constraint estimation,
        batched RANSAC, closure refinement, pose-graph LM) first run
        mid-mission — and on the tunneled backend a program's first call
        per process pays seconds of compile-cache deserialization even
        when fully cached.  Warming them up front (like the reference
        loading its binary — it pays no JIT) makes the replay RTF measure
        SLAM throughput, not XLA executable loading.

        Pass a few ``scans`` (e.g. the 5 clouds the reference discards
        anyway, ``magic::skipFirstNPointClouds``) to also warm the
        per-scan programs by replaying them through a SCRATCH wrapper with
        identical shapes — short sequences otherwise spend most of their
        replay window loading executables.
        """
        if scans:
            scratch = SlamWrapper(self.params)
            ts = (timestamps if timestamps is not None
                  else [0.1 * i for i in range(len(scans))])
            for s, t in zip(scans, ts):
                scratch.process_scan_pipelined(np.asarray(s), float(t))
            scratch._flush_map_pending()
        if not self.params.mapper.is_attempt_loop_closures:
            return
        import jax
        from open3d_slam_tpu.models import constraints as constraints_mod
        from open3d_slam_tpu.ops import (fpfh as fpfh_ops,
                                         normals as normals_ops,
                                         pose_graph as pg_ops, voxel)
        from open3d_slam_tpu.utils.pointcloud import PointCloud

        p = self.params.mapper
        cap = self.params.capacities
        pr = p.place_recognition
        rng = np.random.default_rng(0)

        def cloud(n, with_normals=True):
            pts = jnp.asarray(rng.uniform(-20, 20, (n, 3)), jnp.float32)
            nrm = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
            return PointCloud(points=pts, mask=jnp.ones((n,), bool),
                              normals=nrm if with_normals else None)

        # Feature chain at feature capacity.
        map_c = cloud(cap.submap_points)
        sparse = voxel.voxel_downsample(map_c, pr.feature_voxel_size,
                                        out_capacity=cap.feature_cloud)
        sparse = normals_ops.estimate_normals(
            sparse, radius=pr.normal_estimation_radius, max_nn=pr.normal_knn,
            orientation_reference=jnp.zeros((3,), jnp.float32))
        feat = fpfh_ops.compute_fpfh(sparse, pr.feature_radius,
                                     max_nn=min(pr.feature_knn, 64))
        # Constraint estimation program.
        vox = constraints_mod.get_map_voxel_size(p.map_builder.map_voxel_size)
        cfn = constraints_mod._build_constraint_fn(
            True, constraints_mod.VOXEL_EXPANSION_ICP_CORR * vox,
            constraints_mod.VOXEL_EXPANSION_OVERLAP * vox, True,
            not p.is_refine_odometry_constraints_between_submaps,
            min(cap.submap_points, 32768), min(cap.submap_points, 65536))
        out_c = cfn(map_c, map_c)
        # Batched RANSAC (fixed k bucket) + closure refinement.
        rfn = self.place_recognition._ransac_batched_fn(8)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * 8), sparse)
        res_r = rfn(sparse, feat, stacked, jnp.stack([feat] * 8),
                    jax.random.split(jax.random.PRNGKey(0), 8))
        if self.place_recognition._refine_fn is None:
            self.place_recognition._refine_fn = \
                self.place_recognition._build_refine_fn()
        out_ref = self.place_recognition._refine_fn(map_c, map_c, jnp.eye(4))
        # Pose-graph LM at the deployed capacities.
        n_cap, e_cap = (self.optimization_problem.max_nodes,
                        self.optimization_problem.max_edges)
        graph = pg_ops.PoseGraphData(
            node_poses=jnp.tile(jnp.eye(4), (n_cap, 1, 1)),
            node_mask=jnp.zeros((n_cap,), bool).at[:2].set(True),
            edge_source=jnp.zeros((e_cap,), jnp.int32),
            edge_target=jnp.ones((e_cap,), jnp.int32),
            edge_transform=jnp.tile(jnp.eye(4), (e_cap, 1, 1)),
            edge_information=jnp.tile(jnp.eye(6), (e_cap, 1, 1)),
            edge_uncertain=jnp.zeros((e_cap,), bool),
            edge_mask=jnp.zeros((e_cap,), bool).at[0].set(True))
        gp = p.global_optimization
        out_g = pg_ops.optimize(
            graph, max_correspondence_distance=gp.max_correspondence_distance,
            preference_loop_closure=gp.loop_closure_preference,
            edge_prune_threshold=gp.edge_prune_threshold,
            reference_node=gp.reference_node)
        # One cheap sync flushes all warmup programs through the queue.
        jax.device_get([jnp.ravel(a)[:1] for a in
                        (res_r.transformation, out_c[0], out_ref[1], out_g[0])])

    # ------------------------------------------------------------------
    # Initialization / localization mode

    def set_initial_map(self, map_points: np.ndarray, timestamp: float = 0.0):
        """``setInitialMap`` — route through the Mapper first-scan path with
        is_use_initial_map (``SlamWrapper.cpp:209-220``, ``Mapper.cpp:105-115``)."""
        cloud = pclib.from_numpy(
            map_points.astype(np.float32),
            capacity=self.params.capacities.submap_points)
        cloud = self.mapper.scan_to_map_reg.prepare_initial_map(cloud)
        self.mapper.add_range_measurement(cloud, timestamp)

    def set_initial_transform(self, T: np.ndarray):
        """``setInitialTransform`` (:222-225)."""
        self.odometry.set_initial_transform(T)
        self.mapper.set_map_to_range_sensor_initial(T)

    # ------------------------------------------------------------------
    # Saving (SlamWrapper.cpp:65-78, :242-256)

    def save_map(self, folder: Optional[str] = None) -> str:
        from open3d_slam_tpu.io import pcd
        folder = folder or self.folder_path
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, "map.pcd")
        data = self.mapper.get_assembled_map_point_cloud()
        pcd.write_pcd(path, **data)
        return path

    def dump_submaps(self, prefix: str, dense: bool = False,
                     folder: Optional[str] = None):
        from open3d_slam_tpu.io import pcd
        from open3d_slam_tpu.ops import dense_map as dm
        folder = folder or self.folder_path
        os.makedirs(folder, exist_ok=True)
        for i, s in enumerate(self.submaps.submaps):
            cloud = dm.to_point_cloud(s.dense_map) if dense else s.map_cloud
            data = pclib.to_numpy(cloud)
            pcd.write_pcd(os.path.join(folder, f"{prefix}_{i}.pcd"), **data)

    def get_trajectory(self) -> Tuple[List[float], List[np.ndarray]]:
        buf = self.mapper.map_to_range_sensor_buffer
        return list(buf._times), [t.copy() for t in buf._transforms]

    def get_health(self) -> dict:
        """Decision-relevant run-health counters (the quantities the
        reference prints as online telemetry, ``SlamWrapper.cpp:282-286``,
        ``Odometry.cpp:51-66``, ``Mapper.cpp:151-156``) — recorded in the
        CLI's eval JSON so a truncated or closure-free run is
        distinguishable from a healthy one in the artifact."""
        return {
            "n_submaps": self.submaps.get_num_submaps(),
            "n_loop_closures_accepted": self.n_loop_closures_accepted,
            "n_optimizations_applied": self.n_optimizations_applied,
            "n_odometry_failures": self.odometry.n_failed,
            "n_refinement_skips": self.mapper.n_refinement_skips,
            "n_merge_skips_min_movement": self.mapper.n_merge_skips_min_movement,
            "n_map_points": self.submaps.get_total_num_points(),
        }

    # ------------------------------------------------------------------
    # Visualization accessors (SlamWrapperRos::publishMaps analog,
    # SlamWrapperRos.cpp:222-244 — voxel-downsampled assembled map +
    # per-submap colored cloud)

    def get_assembled_map_for_visualization(self) -> dict:
        from open3d_slam_tpu.ops import voxel as voxel_ops
        data = self.mapper.get_assembled_map_point_cloud()
        vs = self.params.visualization.assembled_map_voxel_size
        if vs > 0 and data["points"].shape[0] > 0:
            pc = pclib.from_numpy(data["points"])
            down = voxel_ops.voxel_downsample(pc, vs)
            data = pclib.to_numpy(down)
        return data

    def get_colored_submaps_for_visualization(self) -> dict:
        from open3d_slam_tpu.utils import colors
        return colors.assemble_colored_submap_cloud(self.submaps.submaps)

    def get_dense_map_cloud(self) -> dict:
        from open3d_slam_tpu.ops import dense_map as dm
        parts = []
        for s in self.submaps.submaps:
            data = pclib.to_numpy(dm.to_point_cloud(s.dense_map))
            if data["points"].shape[0]:
                parts.append(data)
        if not parts:
            return {"points": np.zeros((0, 3), np.float32)}
        out = {}
        for k in parts[0]:
            arrs = [p[k] for p in parts if k in p]
            if len(arrs) == len(parts):
                out[k] = np.concatenate(arrs)
        return out
