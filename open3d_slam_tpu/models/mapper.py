"""Mapper: scan-to-map refinement + map insertion.

Mirror of the reference's ``Mapper`` (``src/Mapper.cpp:30-223``):
  * odometry motion prediction from the odom pose buffer
    (``Mapper.cpp:132-137``);
  * scan-to-map ICP refinement against the active submap patch;
  * fitness gate vs ``min_refinement_fitness`` (``Mapper.cpp:151-156``);
  * min-movement gate before merging the scan into the submap
    (``Mapper.cpp:170-176``);
  * loop-closure pose rewrite (``loopClosureUpdate``, ``Mapper.cpp:44-47``);
  * map->odom computation (``getMapToOdom``, ``Mapper.cpp:58-63``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.models.buffers import TransformInterpolationBuffer
from open3d_slam_tpu.models.scan_to_map_registration import (
    ScanToMapIcp, scan_to_map_registration_factory)
from open3d_slam_tpu.models.submap_collection import SubmapCollection
from open3d_slam_tpu.utils.config import MapperParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud


class MapperPending:
    """Device-side state of one dispatched-but-unfinalized mapping step.

    The scan-to-map registration result stays on device until
    ``Mapper.finalize_range_measurement`` pulls it together with the queued
    odometry pendings in ONE transfer.  In pipelined replay the pull for
    scan t is issued after scan t+1's odometry/preprocess programs are
    already queued, so the tunnel round-trip overlaps device compute
    instead of serializing the pipeline (the reference overlaps its stages
    with worker threads, ``SlamWrapper.cpp:228-234``; on one chip all
    device programs serialize anyway, so hiding the host<->device latency
    is the whole game).
    """
    __slots__ = ("timestamp", "raw_scan", "processed", "result",
                 "odom_pending")

    def __init__(self, timestamp, raw_scan, processed, result, odom_pending):
        self.timestamp = timestamp
        self.raw_scan = raw_scan
        self.processed = processed
        self.result = result
        self.odom_pending = odom_pending


class Mapper:
    def __init__(self, params: MapperParameters,
                 odom_to_range_sensor_buffer: TransformInterpolationBuffer,
                 submaps: SubmapCollection,
                 processed_capacity: int = 16384,
                 patch_capacity: int = 65536,
                 buffer_size_limit: int = 2000):
        self.params = params
        self.odom_to_range_sensor_buffer = odom_to_range_sensor_buffer
        self.submaps = submaps
        self.scan_to_map_reg: ScanToMapIcp = scan_to_map_registration_factory(
            params, processed_capacity, patch_capacity)
        self.map_to_range_sensor = np.eye(4)
        self.map_to_range_sensor_prev = np.eye(4)
        self.map_to_range_sensor_last_scan_insertion = np.eye(4)
        self.map_to_range_sensor_buffer = TransformInterpolationBuffer(buffer_size_limit)
        self.last_measurement_timestamp: Optional[float] = None
        self.is_new_initial_value_set = False
        self.is_ignore_odometry_prediction = False
        self.preprocessed_scan: Optional[PointCloud] = None
        # health counters (reference prints these as online warnings,
        # Mapper.cpp:151-156, :170-176; surfaced in the CLI eval JSON)
        self.n_refinement_skips = 0
        self.n_merge_skips_min_movement = 0

    # ------------------------------------------------------------------

    def loop_closure_update(self, correction: np.ndarray):
        """``loopClosureUpdate`` (``Mapper.cpp:44-47``)."""
        c = np.asarray(correction, np.float64)
        self.map_to_range_sensor = c @ self.map_to_range_sensor
        self.map_to_range_sensor_prev = c @ self.map_to_range_sensor_prev

    def set_map_to_range_sensor(self, T: np.ndarray):
        self.map_to_range_sensor = np.asarray(T, np.float64)

    def set_map_to_range_sensor_initial(self, T: np.ndarray):
        """``setMapToRangeSensorInitial`` (``Mapper.cpp:88-92``)."""
        T = np.asarray(T, np.float64)
        self.map_to_range_sensor_prev = T.copy()
        self.map_to_range_sensor = T.copy()
        self.is_new_initial_value_set = True

    def has_processed_measurements(self) -> bool:
        return not self.map_to_range_sensor_buffer.empty()

    def get_map_to_range_sensor(self, t: float) -> np.ndarray:
        return self.map_to_range_sensor_buffer.lookup_clamped(t)

    def get_map_to_odom(self, t: float) -> np.ndarray:
        """``getMapToOdom`` (``Mapper.cpp:58-63``)."""
        odom = self.odom_to_range_sensor_buffer.lookup_clamped(t)
        m = self.map_to_range_sensor_buffer.lookup_clamped(t)
        return m @ np.linalg.inv(odom)

    def get_active_submap(self):
        return self.submaps.get_active_submap()

    # ------------------------------------------------------------------

    def preprocess_scan(self, raw_scan: PointCloud):
        """Pose-independent scan preprocessing (phase A of the mapping
        dispatch): the dual-crop/voxelize/normals/downsample chain of
        ``ScanToMapIcp::processForScanMatchingAndMerging``
        (``ScanToMapRegistration.cpp:42-54``).  Pipelined replay dispatches
        this BEFORE finalizing the previous scan so the device crunches it
        while the finalize pull rides the tunnel round-trip."""
        return self.scan_to_map_reg.process_for_scan_matching_and_merging(
            raw_scan, self.map_to_range_sensor)

    def dispatch_range_measurement(self, raw_scan: PointCloud, timestamp: float,
                                   odom_pending=None, processed=None):
        """``addRangeMeasurement`` (``Mapper.cpp:101-181``), dispatch half:
        motion prediction + map-patch prep + scan-to-map registration,
        queued on device WITHOUT pulling the result.

        Returns ``(pending, sync_ok)``: ``pending`` is a ``MapperPending``
        for ``finalize_range_measurement``, or None when a synchronous path
        (first scan, out-of-order drop, fresh initial value) fully handled
        the measurement — then ``sync_ok`` is the step's return value.

        With ``odom_pending`` (an ``OdometryPending`` from
        ``LidarOdometry.add_range_scan_async``), the odometry pose enters
        the motion prediction as a TRACED device value and the scalar pull
        of BOTH stages is batched into ONE device->host round-trip per scan
        (each separate blocking pull costs a full tunnel RTT).  Host gate
        logic and bookkeeping are bit-identical either way.
        """
        p = self.params
        self.submaps.set_map_to_range_sensor(self.map_to_range_sensor)

        def _finalize_odom():
            if odom_pending is not None:
                odom_pending.owner.finalize_pending(
                    upto=odom_pending.timestamp)

        # First scan path.
        if self.submaps.get_active_submap().is_empty():
            _finalize_odom()
            if p.is_use_initial_map:
                assert self.scan_to_map_reg.is_merge_scan_valid(raw_scan), \
                    "Init map invalid (needs normals for this registration type)"
                self.submaps.insert_scan(raw_scan, raw_scan, np.eye(4), timestamp)
            else:
                if processed is None:
                    processed = self.preprocess_scan(raw_scan)
                self.submaps.insert_scan(raw_scan, processed.merge, np.eye(4), timestamp)
                self.map_to_range_sensor_buffer.push(timestamp, self.map_to_range_sensor)
            return None, True

        if (self.last_measurement_timestamp is not None and
                timestamp < self.last_measurement_timestamp):
            _finalize_odom()
            print("MAPPER WARNING: measurements came out of order!")
            return None, False

        # Odometry motion prediction (Mapper.cpp:132-137).
        want_prediction = (not self.is_new_initial_value_set and
                           not self.is_ignore_odometry_prediction and
                           self.last_measurement_timestamp is not None)
        if odom_pending is not None and want_prediction:
            # Device-side: estimate = map_prev @ inv(odom_prev) @ odom_now,
            # falling back to map_prev when this scan's odometry failed
            # (the reference's is_odom_okay guard).  odom_prev comes from
            # the finalized float64 host chain; odom_now is the pending
            # device pose — no host round-trip.
            odom_prev = self.odom_to_range_sensor_buffer.lookup_clamped(
                self.last_measurement_timestamp)
            M = jnp.asarray(
                self.map_to_range_sensor_prev @ np.linalg.inv(odom_prev),
                jnp.float32)
            prev32 = jnp.asarray(self.map_to_range_sensor_prev, jnp.float32)
            map_to_range_sensor_estimate = jnp.where(
                odom_pending.ok, M @ odom_pending.cum_new, prev32)
        else:
            is_odom_okay = (odom_pending is not None or
                            self.odom_to_range_sensor_buffer.has(timestamp))
            map_to_range_sensor_estimate = self.map_to_range_sensor_prev.copy()
            if is_odom_okay and want_prediction and odom_pending is None:
                odom_now = self.odom_to_range_sensor_buffer.lookup_clamped(timestamp)
                odom_prev = self.odom_to_range_sensor_buffer.lookup_clamped(
                    self.last_measurement_timestamp)
                odometry_motion = np.linalg.inv(odom_prev) @ odom_now
                map_to_range_sensor_estimate = self.map_to_range_sensor_prev @ odometry_motion
        self.is_ignore_odometry_prediction = False

        if processed is None:
            processed = self.preprocess_scan(raw_scan)
        result = self.scan_to_map_reg.scan_to_map_registration(
            processed.match, self.submaps.get_active_submap(),
            self.map_to_range_sensor, map_to_range_sensor_estimate)
        self.preprocessed_scan = processed.match

        if self.is_new_initial_value_set:
            _finalize_odom()
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(timestamp, self.map_to_range_sensor)
            self.is_new_initial_value_set = False
            self.is_ignore_odometry_prediction = True
            return None, True

        # Start the D2H copies NOW: by finalize time the result scalars are
        # already host-side and the pull costs ~0 instead of a tunnel RTT.
        from open3d_slam_tpu.utils.device import prefetch_to_host
        prefetch_to_host(result.fitness, result.transformation)
        return MapperPending(timestamp, raw_scan, processed, result,
                             odom_pending), True

    def finalize_range_measurement(self, mp: MapperPending) -> bool:
        """``addRangeMeasurement`` finalize half: the ONE blocking
        device->host transfer per scan (queued odometry pendings +
        scan-to-map scalars together), then the host gates + submap insert
        (``Mapper.cpp:151-181``)."""
        p = self.params
        timestamp, result, odom_pending = mp.timestamp, mp.result, mp.odom_pending
        if odom_pending is not None:
            owner = odom_pending.owner
            # Only pendings up to THIS measurement: in pipelined replay the
            # next scan's odometry is already in flight, and waiting on it
            # here would forfeit the stage overlap.
            pend = [q for q in owner._pending
                    if q.timestamp <= odom_pending.timestamp]
            pulled = jax.device_get(
                ([(q.fitness, q.rmse, q.T) for q in pend],
                 result.fitness, result.transformation))
            owner.finalize_pending(pulled[0], upto=odom_pending.timestamp)
            if not self.odom_to_range_sensor_buffer.has(timestamp):
                print("WARNING: odom buffer does not have the desired "
                      "transform; scan-to-map refinement attempted anyway")
            fitness, result_T = pulled[1], pulled[2]
        else:
            fitness, result_T = jax.device_get(
                (result.fitness, result.transformation))
        fitness = float(fitness)
        if (not p.is_ignore_min_refinement_fitness and
                fitness < p.scan_matcher.min_refinement_fitness):
            self.n_refinement_skips += 1
            print(f"Skipping the refinement step, fitness: {fitness:.3f}")
            return False

        self.map_to_range_sensor = np.asarray(result_T, np.float64)
        self.map_to_range_sensor_buffer.push(timestamp, self.map_to_range_sensor)
        self.submaps.set_map_to_range_sensor(self.map_to_range_sensor)

        if p.is_use_initial_map and not p.is_merge_scans_into_map:
            self.last_measurement_timestamp = timestamp
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            return True

        # Min-movement gate (Mapper.cpp:170-176).
        motion = np.linalg.inv(self.map_to_range_sensor_last_scan_insertion) @ self.map_to_range_sensor
        moved_too_little = (np.linalg.norm(motion[:3, 3]) <
                            p.min_movement_between_mapping_steps)
        if not moved_too_little:
            self.submaps.insert_scan(mp.raw_scan, mp.processed.merge,
                                     self.map_to_range_sensor, timestamp)
            self.map_to_range_sensor_last_scan_insertion = self.map_to_range_sensor.copy()
        else:
            self.n_merge_skips_min_movement += 1

        self.last_measurement_timestamp = timestamp
        self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
        return True

    def add_range_measurement(self, raw_scan: PointCloud, timestamp: float,
                              odom_pending=None) -> bool:
        """``addRangeMeasurement`` (``Mapper.cpp:101-181``), blocking form:
        dispatch + immediate finalize (one device pull)."""
        mp, ok = self.dispatch_range_measurement(raw_scan, timestamp,
                                                 odom_pending=odom_pending)
        if mp is None:
            return ok
        return self.finalize_range_measurement(mp)

    # ------------------------------------------------------------------

    def get_assembled_map_point_cloud(self):
        """Concatenate all submap clouds (``getAssembledMapPointCloud``,
        ``Mapper.cpp:183-208``) as numpy arrays."""
        from open3d_slam_tpu.utils import pointcloud as pclib
        parts = [pclib.to_numpy(s.map_cloud) for s in self.submaps.submaps
                 if int(s.map_cloud.count()) > 0]
        if not parts:
            return {"points": np.zeros((0, 3), np.float32)}
        out = {}
        for k in parts[0]:
            out[k] = np.concatenate([p[k] for p in parts if k in p], axis=0)
        return out
