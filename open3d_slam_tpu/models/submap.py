"""Submap: one radius-bounded local map.

Mirror of the reference's ``Submap`` (``src/Submap.cpp:27-259``):
  * sparse ``map_cloud`` — voxelized point cloud with normals, grown by scan
    insertion (``insertScan``, ``Submap.cpp:39-75``): transform scan to map
    frame, carve every N scans, concatenate, re-voxelize inside the cropping
    volume;
  * dense map — ``VoxelizedPointCloud`` aggregation + carving
    (``insertScanDenseMap``, ``Submap.cpp:77-92``);
  * ``feature_cloud``/``fpfh`` — 0.5 m-voxel cloud + FPFH for place
    recognition (``computeFeatures``, ``Submap.cpp:228-248``);
  * rigid ``transform`` on loop closure (``Submap.cpp:94-107``), center
    (``computeSubmapCenter``, ``Submap.cpp:255-259``).

TPU design: all clouds are fixed-capacity device pytrees; insertion is one
jitted concat+carve+revoxelize program; the carving cadence counter and
submap lifecycle live host-side (control flow).
"""
from __future__ import annotations

import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.ops import carving, croppers, dense_map, fpfh as fpfh_ops
from open3d_slam_tpu.ops import normals as normals_ops, sorted_store, voxel
from open3d_slam_tpu.utils import pointcloud as pclib, se3
from open3d_slam_tpu.utils.config import MapperParameters
from open3d_slam_tpu.utils.pointcloud import PointCloud


class Submap:
    def __init__(self, submap_id: int, parent_id: int, params: MapperParameters,
                 map_capacity: int = 262144, dense_capacity: int = 262144,
                 feature_capacity: int = 8192):
        self.id = submap_id
        self.parent_id = parent_id
        self.params = params
        self.map_capacity = map_capacity
        self.feature_capacity = feature_capacity
        self.map_cloud: PointCloud = pclib.empty(map_capacity, with_normals=True)
        self.dense_map = dense_map.empty(
            dense_capacity, max(params.dense_map_builder.map_voxel_size, 1e-3))
        self.map_builder_cropper = croppers.from_cropper_params(params.map_builder.cropper)
        self.dense_map_cropper = croppers.from_cropper_params(params.dense_map_builder.cropper)
        # ColorRangeCropper applied to the dense-map input (Submap.cpp:80).
        self.color_cropper = croppers.ColorRangeCropper()
        self.map_to_submap = np.eye(4)       # origin pose in map frame
        self.map_to_range_sensor = np.eye(4)
        self.submap_center: Optional[np.ndarray] = None
        self.n_scans_inserted_map = 0
        self.n_scans_inserted_dense = 0
        self.feature_cloud: Optional[PointCloud] = None
        self.fpfh: Optional[jnp.ndarray] = None
        self._feature_time: Optional[float] = None
        self._pending_feat_count = None   # prefetched saturation check
        self.creation_time: Optional[float] = None

    # ------------------------------------------------------------------

    def is_empty(self) -> bool:
        return self.n_scans_inserted_map == 0

    def insert_scan(self, raw_scan: PointCloud, preprocessed_scan: PointCloud,
                    map_to_range_sensor: np.ndarray, timestamp: float,
                    is_perform_carving: bool = True,
                    enable=True) -> bool:
        """``Submap::insertScan`` semantics (``Submap.cpp:39-75``).

        One fused jitted program (``ops/sorted_store.py``): carve under
        ``lax.cond`` -> voxel-key merge via one multi-operand sort —
        ~13 ms/scan at 262k map capacity, vs ~150 ms for the old
        argsort/searchsorted re-voxelize chain.  Keys are recomputed from
        the points each insert (stateless), so carving and loop-closure
        transforms need no invariant maintenance.  ``enable`` may be a
        traced device bool: a disabled insert runs the same program as a
        no-op (device-side gating keeps host round-trips off the hot path).
        """
        p = self.params
        self.map_to_range_sensor = np.asarray(map_to_range_sensor, np.float64)
        T = jnp.asarray(self.map_to_range_sensor, jnp.float32)

        if p.is_use_initial_map and self.n_scans_inserted_map == 0:
            # First-scan path for localization mode: map = voxelized scan.
            down = voxel.voxel_downsample(preprocessed_scan,
                                          p.map_builder.map_voxel_size,
                                          out_capacity=self.map_capacity)
            self.map_cloud = _ensure_normals(down)
            self.n_scans_inserted_map += 1
            return True

        carve_due = (is_perform_carving and self.n_scans_inserted_map > 0 and
                     self.n_scans_inserted_map % p.map_builder.carving.carve_space_every_n_scans == 1)
        cv = p.map_builder.carving
        max_steps = int(np.ceil(cv.max_raytracing_length / max(cv.voxel_size, 1e-3))) + 1
        fn = _insert_scan_fn(
            map_voxel_size=p.map_builder.map_voxel_size,
            carve_voxel=cv.voxel_size,
            truncation=cv.truncation_distance,
            max_ray=cv.max_raytracing_length,
            min_dot=cv.min_dot_product_with_normal,
            max_steps=max_steps,
        )
        self.map_cloud = fn(_ensure_normals(self.map_cloud),
                            _ensure_normals(preprocessed_scan), T,
                            self.map_builder_cropper,
                            jnp.asarray(carve_due), jnp.asarray(enable))
        self.n_scans_inserted_map += 1
        return True

    def insert_scan_dense_map(self, raw_scan: PointCloud,
                              map_to_range_sensor: np.ndarray,
                              timestamp: float,
                              is_perform_carving: bool = True) -> bool:
        """``Submap::insertScanDenseMap`` (``Submap.cpp:77-92``)."""
        p = self.params
        T = jnp.asarray(map_to_range_sensor, jnp.float32)
        cropped = self.dense_map_cropper.crop(raw_scan)
        cropped = self.color_cropper.crop(cropped)  # Submap.cpp:80
        transformed = cropped.with_(points=se3.transform_points(T, cropped.points))
        self.dense_map = dense_map.insert(self.dense_map, transformed)
        carve_due = (is_perform_carving and self.n_scans_inserted_dense > 0 and
                     self.n_scans_inserted_dense %
                     p.dense_map_builder.carving.carve_space_every_n_scans == 1)
        if carve_due:
            cv = p.dense_map_builder.carving
            dedup = voxel.remove_duplicate_points_in_voxels(
                raw_scan, max(p.dense_map_builder.map_voxel_size, 1e-3))
            scan_in_map = dedup.with_(points=se3.transform_points(T, dedup.points))
            step = 2.0 * cv.neighborhood_radius_dense_map
            max_steps = int(np.ceil(cv.max_raytracing_length / max(step, 1e-3))) + 1
            keys, base = carving.carved_voxel_keys(
                scan_in_map, T[:3, 3],
                float(self.dense_map.voxel_size), cv.neighborhood_radius_dense_map,
                cv.truncation_distance, cv.max_raytracing_length,
                max_steps=max_steps)
            self.dense_map = dense_map.remove_keys(
                self.dense_map, keys, base,
                neighbor_deltas=carving.FACE_NEIGHBOR_DELTAS)
        self.n_scans_inserted_dense += 1
        return True

    # ------------------------------------------------------------------

    def transform(self, T: np.ndarray):
        """Rigidly move the whole submap (loop-closure update,
        ``Submap.cpp:94-107``).  Note the reference's convention:
        map_to_range_sensor * T and center = T * center."""
        Tj = jnp.asarray(T, jnp.float32)
        self.map_cloud = self.map_cloud.with_(
            points=se3.transform_points(Tj, self.map_cloud.points),
            normals=(None if self.map_cloud.normals is None
                     else se3.rotate_vectors(Tj, self.map_cloud.normals)))
        self.dense_map = dense_map.transform(self.dense_map, Tj)
        if self.feature_cloud is not None:
            self.feature_cloud = self.feature_cloud.with_(
                points=se3.transform_points(Tj, self.feature_cloud.points),
                normals=(None if self.feature_cloud.normals is None
                         else se3.rotate_vectors(Tj, self.feature_cloud.normals)))
        T64 = np.asarray(T, np.float64)
        self.map_to_range_sensor = self.map_to_range_sensor @ T64
        self.map_to_submap = T64 @ self.map_to_submap
        if self.submap_center is not None:
            self.submap_center = (T64[:3, :3] @ self.submap_center + T64[:3, 3])

    # ------------------------------------------------------------------

    def get_map_to_submap_center(self) -> np.ndarray:
        if self.submap_center is not None:
            return self.submap_center
        return self.map_to_submap[:3, 3]

    def compute_submap_center(self):
        pts = self.map_cloud.masked_points(0.0)
        n = jnp.clip(self.map_cloud.count().astype(jnp.float32), 1.0, None)
        center = jnp.sum(jnp.where(self.map_cloud.mask[:, None],
                                   self.map_cloud.points, 0.0), axis=0) / n
        self.submap_center = np.asarray(center, np.float64)

    # ------------------------------------------------------------------

    def _check_pending_feature_saturation(self):
        if self._pending_feat_count is None:
            return
        n_feat = int(self._pending_feat_count)   # prefetched: ~free
        self._pending_feat_count = None
        if n_feat >= self.feature_capacity:
            print(f"WARNING: submap {self.id} feature cloud saturated at "
                  f"{self.feature_capacity} voxels — raise "
                  f"CapacityParameters.feature_cloud or place-recognition "
                  f"quality degrades (uniform-stride subsample in effect)")

    def compute_features(self, force: bool = False):
        """0.5 m-voxel sparse cloud + FPFH (``computeFeatures``,
        ``Submap.cpp:228-248``), rate-limited like the reference."""
        p = self.params.place_recognition
        min_dt = self.params.submaps.min_seconds_between_feature_computation
        now = _time.monotonic()
        if (not force and self.fpfh is not None and self._feature_time is not None
                and now - self._feature_time < min_dt):
            return
        sparse = voxel.voxel_downsample(self.map_cloud, p.feature_voxel_size,
                                        out_capacity=self.feature_capacity)
        # Saturation check WITHOUT a blocking pull on the critical path: the
        # count rides a prefetched async copy and is inspected lazily at the
        # next feature event (a warning can afford one event of latency; a
        # blocking int() here costs a full tunnel RTT per finished submap).
        self._check_pending_feature_saturation()
        n_feat_dev = sparse.count()
        from open3d_slam_tpu.utils.device import prefetch_to_host
        prefetch_to_host(n_feat_dev)
        self._pending_feat_count = n_feat_dev
        sparse = normals_ops.estimate_normals(
            sparse, radius=p.normal_estimation_radius, max_nn=p.normal_knn,
            orientation_reference=jnp.zeros((3,), jnp.float32))
        self.feature_cloud = sparse
        self.fpfh = fpfh_ops.compute_fpfh(sparse, p.feature_radius,
                                          max_nn=min(p.feature_knn, 64))
        self._feature_time = now


def _ensure_normals(pc: PointCloud) -> PointCloud:
    if pc.normals is None:
        return pc.with_(normals=jnp.zeros_like(pc.points))
    return pc


from functools import lru_cache, partial  # noqa: E402


@lru_cache(maxsize=None)
def _insert_scan_fn(map_voxel_size: float, carve_voxel: float,
                    truncation: float, max_ray: float, min_dot: float,
                    max_steps: int):
    """Jitted sparse-map insertion: carve (under ``lax.cond``, cadence flag
    traced so it never retriggers compilation) -> fused voxel-key merge
    (``sorted_store.insert_scan_fused``)."""

    @jax.jit
    def fn(map_cloud: PointCloud, scan: PointCloud, T: jnp.ndarray,
           cropper: croppers.CroppingVolume, carve_due: jnp.ndarray,
           enable: jnp.ndarray) -> PointCloud:
        def do_carve(mc):
            scan_in_map = scan.with_(
                points=se3.transform_points(T, scan.points),
                normals=se3.rotate_vectors(T, scan.normals))
            keep = carving.carve_mask(
                mc, scan_in_map, T[:3, 3], carve_voxel, truncation, max_ray,
                min_dot, max_steps=max_steps)
            return mc.with_(mask=keep)

        map_cloud2 = jax.lax.cond(carve_due & enable, do_carve,
                                  lambda mc: mc, map_cloud)
        return sorted_store.insert_scan_fused(
            map_cloud2, scan, T, cropper, map_voxel_size, enable)

    return fn
