"""Submap collection: active-submap lifecycle, revisiting, finished queue.

Mirror of the reference's ``SubmapCollection``
(``src/SubmapCollection.cpp:28-364``):
  * scan insertion + active-submap switching by radius / adjacency /
    occupancy-fitness revisit (``insertScan`` :172-207,
    ``updateActiveSubmap`` :94-131, ``createNewSubmap`` :133-145);
  * overlap-scan buffer replayed into a newly activated submap
    (``addScanToBuffer``/``insertBufferedScans`` :83-92);
  * finished-submap and loop-closure-candidate queues;
  * feature computation for finished submaps (``computeFeatures`` :219-243);
  * pose-graph update application with parent-chaining for non-optimized
    submaps (``transform`` :284-335);
  * occupancy consistency check for submap switching
    (``isSwitchingSubmapsConsistant`` :352-364) — voxel membership at
    2.5 x mapVoxelSize (magic.hpp:15) done with a sorted-key membership
    test on device.
"""
from __future__ import annotations

from collections import deque
from functools import partial
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.models.adjacency import AdjacencyMatrix
from open3d_slam_tpu.models.submap import Submap
from open3d_slam_tpu.ops.voxel import pack_coords, voxel_coords
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.config import MapperParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud

VOXEL_EXPANSION_ADJACENCY_REVISITING = 2.5  # magic.hpp:15
INT32_MAX = np.iinfo(np.int32).max


class TimestampedSubmapId(NamedTuple):
    submap_id: int
    time: float


class ScanTimeTransform(NamedTuple):
    cloud: PointCloud
    timestamp: float
    map_to_range_sensor: np.ndarray


class OptimizedTransform(NamedTuple):
    submap_id: int
    dT: np.ndarray


@partial(jax.jit, static_argnames=())
def _occupancy_fitness(map_points: jnp.ndarray, map_mask: jnp.ndarray,
                       scan: PointCloud, T: jnp.ndarray, cell_size: jnp.ndarray):
    """Fraction of scan points landing in occupied voxels of the map.

    Exact packed keys (no hash collisions — ``isSwitchingSubmapsConsistant``
    compares exact voxel membership, ``SubmapCollection.cpp:352-364``)."""
    map_coords = voxel_coords(map_points, cell_size)
    base = jnp.min(jnp.where(map_mask[:, None], map_coords, jnp.int32(2**30)),
                   axis=0)
    keys = jnp.where(map_mask, pack_coords(map_coords, base), INT32_MAX)
    keys_sorted = jnp.sort(keys)
    p = se3.transform_points(T, scan.points)
    qk = pack_coords(voxel_coords(p, cell_size), base)
    pos = jnp.clip(jnp.searchsorted(keys_sorted, qk, side="left"),
                   0, keys_sorted.shape[0] - 1)
    hit = (keys_sorted[pos] == qk) & (qk >= 0) & scan.mask
    n = jnp.clip(jnp.sum(scan.mask.astype(jnp.float32)), 1.0, None)
    return jnp.sum(hit.astype(jnp.float32)) / n


class SubmapCollection:
    def __init__(self, params: MapperParameters,
                 map_capacity: int = 262144, dense_capacity: int = 262144,
                 feature_capacity: int = 8192):
        self.params = params
        self.map_capacity = map_capacity
        self.dense_capacity = dense_capacity
        self.feature_capacity = feature_capacity
        self.submaps: List[Submap] = []
        self.adjacency = AdjacencyMatrix()
        self.active_submap_idx = 0
        self._submap_id_counter = 0
        self.num_scans_merged_in_active_submap = 0
        self.map_to_range_sensor = np.eye(4)
        self.timestamp: Optional[float] = None
        self.overlap_scans_buffer: deque = deque(
            maxlen=max(1, params.submaps.num_scans_overlap))
        self.finished_submaps_idxs: List[TimestampedSubmapId] = []
        self.loop_closure_candidates_idxs: List[TimestampedSubmapId] = []
        self.last_finished_submap_idx: Optional[int] = None
        self._force_new_submap = False
        self.create_new_submap(self.map_to_range_sensor)

    # ------------------------------------------------------------------

    def is_empty(self) -> bool:
        return not self.submaps

    def get_num_submaps(self) -> int:
        return len(self.submaps)

    def get_active_submap(self) -> Submap:
        return self.submaps[self.active_submap_idx]

    def get_submap(self, idx: int) -> Submap:
        return self.submaps[idx]

    def get_total_num_points(self) -> int:
        return int(sum(int(s.map_cloud.count()) for s in self.submaps))

    def set_map_to_range_sensor(self, T: np.ndarray):
        self.map_to_range_sensor = np.asarray(T, np.float64)

    def pop_finished_submap_ids(self) -> List[TimestampedSubmapId]:
        out, self.finished_submaps_idxs = self.finished_submaps_idxs, []
        return out

    def pop_loop_closure_candidates(self) -> List[TimestampedSubmapId]:
        out, self.loop_closure_candidates_idxs = self.loop_closure_candidates_idxs, []
        return out

    # ------------------------------------------------------------------

    def create_new_submap(self, map_to_submap: np.ndarray):
        submap_id = self._submap_id_counter
        self._submap_id_counter += 1
        parent_id = self.active_submap_idx
        s = Submap(submap_id, parent_id, self.params,
                   map_capacity=self.map_capacity,
                   dense_capacity=self.dense_capacity,
                   feature_capacity=self.feature_capacity)
        s.map_to_submap = np.asarray(map_to_submap, np.float64).copy()
        self.submaps.append(s)
        self.active_submap_idx = len(self.submaps) - 1
        self.num_scans_merged_in_active_submap = 0

    def find_closest_submap(self, map_to_range_sensor: np.ndarray) -> int:
        p0 = map_to_range_sensor[:3, 3]
        dists = [np.linalg.norm(p0 - s.get_map_to_submap_center())
                 for s in self.submaps]
        return int(np.argmin(dists))

    def is_switching_submaps_consistent(self, scan: PointCloud,
                                        candidate_idx: int,
                                        map_to_range_sensor: np.ndarray) -> bool:
        cell = VOXEL_EXPANSION_ADJACENCY_REVISITING * max(
            self.params.map_builder.map_voxel_size, 0.04)
        cand = self.submaps[candidate_idx]
        fitness = float(_occupancy_fitness(
            cand.map_cloud.points, cand.map_cloud.mask, scan,
            jnp.asarray(map_to_range_sensor, jnp.float32),
            jnp.asarray(cell, jnp.float32)))
        return fitness > self.params.submaps.adjacency_based_revisiting_min_fitness

    def update_active_submap(self, map_to_range_sensor: np.ndarray, scan: PointCloud):
        """``updateActiveSubmap`` (``SubmapCollection.cpp:94-131``)."""
        if self._force_new_submap:
            self.create_new_submap(self.map_to_range_sensor)
            self._force_new_submap = False
            return
        if self.num_scans_merged_in_active_submap < self.params.submaps.min_num_range_data:
            return
        if self.params.is_use_initial_map:
            return
        closest_idx = self.find_closest_submap(self.map_to_range_sensor)
        closest = self.submaps[closest_idx]
        active = self.submaps[self.active_submap_idx]
        d = np.linalg.norm(self.map_to_range_sensor[:3, 3] - closest.get_map_to_submap_center())
        if d < self.params.submaps.radius:
            if closest_idx == self.active_submap_idx:
                return
            if (self.adjacency.is_adjacent(closest.id, active.id) and
                    self.is_switching_submaps_consistent(scan, closest_idx, map_to_range_sensor)):
                self.active_submap_idx = closest_idx
            else:
                d_active = np.linalg.norm(self.map_to_range_sensor[:3, 3] -
                                          active.get_map_to_submap_center())
                if d_active > self.params.submaps.radius:
                    self.create_new_submap(self.map_to_range_sensor)
        else:
            self.create_new_submap(self.map_to_range_sensor)

    # ------------------------------------------------------------------

    def insert_scan(self, raw_scan: PointCloud, preprocessed_scan: PointCloud,
                    map_to_range_sensor: np.ndarray, timestamp: float) -> bool:
        """``insertScan`` (``SubmapCollection.cpp:172-207``)."""
        self.map_to_range_sensor = np.asarray(map_to_range_sensor, np.float64)
        self.timestamp = timestamp
        if not self.submaps:
            self.create_new_submap(self.map_to_range_sensor)
        if self.submaps[self.active_submap_idx].is_empty() and len(self.submaps) == 1:
            self.submaps[self.active_submap_idx].insert_scan(
                raw_scan, preprocessed_scan, map_to_range_sensor, timestamp, True)
            self.num_scans_merged_in_active_submap += 1
            return True

        self.overlap_scans_buffer.append(ScanTimeTransform(
            preprocessed_scan, timestamp, self.map_to_range_sensor.copy()))
        prev_active = self.active_submap_idx
        self.update_active_submap(map_to_range_sensor, preprocessed_scan)
        changed = prev_active != self.active_submap_idx
        if changed:
            self.submaps[prev_active].insert_scan(
                raw_scan, preprocessed_scan, map_to_range_sensor, timestamp, True)
            self.submaps[prev_active].compute_submap_center()
            self.last_finished_submap_idx = prev_active
            self.finished_submaps_idxs.append(TimestampedSubmapId(prev_active, timestamp))
            self.num_scans_merged_in_active_submap = 0
            id1 = self.submaps[prev_active].id
            id2 = self.submaps[self.active_submap_idx].id
            self.adjacency.add_edge(id1, id2)
            # Replay buffered overlap scans into the new active submap.
            while self.overlap_scans_buffer:
                s = self.overlap_scans_buffer.popleft()
                self.submaps[self.active_submap_idx].insert_scan(
                    s.cloud, s.cloud, s.map_to_range_sensor, s.timestamp, False)
        else:
            self.submaps[self.active_submap_idx].insert_scan(
                raw_scan, preprocessed_scan, map_to_range_sensor, timestamp, True)
        self.num_scans_merged_in_active_submap += 1
        return True

    def insert_scan_dense_map(self, raw_scan: PointCloud,
                              map_to_range_sensor: np.ndarray, timestamp: float):
        self.submaps[self.active_submap_idx].insert_scan_dense_map(
            raw_scan, map_to_range_sensor, timestamp, True)

    def force_new_submap_creation(self):
        """``forceNewSubmapCreation`` (``SubmapCollection.cpp:163-170``):
        insert an EMPTY cloud so the switch bookkeeping (finish prev submap,
        feature/LC queues, overlap replay) runs without double-inserting any
        data.  Works even when the overlap buffer is empty."""
        if not self.submaps or self.timestamp is None:
            return
        self._force_new_submap = True
        # Same capacity/pytree structure as the buffered scans to reuse the
        # compiled insertion program; all-False mask = PointCloud().
        if self.overlap_scans_buffer:
            template = self.overlap_scans_buffer[-1].cloud
            empty_scan = template.with_(mask=jnp.zeros_like(template.mask))
        else:
            from open3d_slam_tpu.utils import pointcloud as pclib
            empty_scan = pclib.empty(8, with_normals=True)
        self.insert_scan(empty_scan, empty_scan, self.map_to_range_sensor, self.timestamp)
        self._force_new_submap = False

    # ------------------------------------------------------------------

    def compute_features(self, finished_ids: List[TimestampedSubmapId]):
        """``computeFeatures`` (``SubmapCollection.cpp:219-243``); sequential
        here (features + odometry constraints are both device programs)."""
        for tid in finished_ids:
            self.submaps[tid.submap_id].compute_features()
            self.loop_closure_candidates_idxs.append(tid)

    def update_adjacency_matrix(self, loop_closure_constraints):
        for c in loop_closure_constraints:
            self.adjacency.add_edge(c.source_submap_idx, c.target_submap_idx)
            self.adjacency.mark_as_loop_closure_submap(c.source_submap_idx)
            self.adjacency.mark_as_loop_closure_submap(c.target_submap_idx)

    # ------------------------------------------------------------------

    def transform(self, transform_increments: List[OptimizedTransform]):
        """Apply optimized pose-graph increments; non-optimized submaps chain
        to their parent (``SubmapCollection.cpp:284-335``)."""
        optimized = set()
        by_id = {u.submap_id: u for u in transform_increments}
        for u in transform_increments:
            if u.submap_id < len(self.submaps):
                self.submaps[u.submap_id].transform(u.dT)
                optimized.add(u.submap_id)
        to_update = [i for i in range(len(self.submaps)) if i not in optimized]
        to_update_set = set(to_update)
        for idx in to_update:
            if not transform_increments:
                break
            current = idx
            while True:
                parent = self.submaps[current].parent_id
                if parent not in to_update_set:
                    if parent in by_id:
                        self.submaps[idx].transform(by_id[parent].dT)
                    break
                if parent == current:
                    raise RuntimeError("parent chain loop")
                current = parent
        self.overlap_scans_buffer.clear()
