"""Place recognition: loop-closure constraint detection.

Mirror of the reference's ``PlaceRecognition``
(``src/PlaceRecognition.cpp:40-286``):
  * candidate gating by active-adjacency / adjacency / search radius /
    consecutiveness / min-submaps-between-closures
    (``getLoopClosureCandidatesIdxs`` :231-284);
  * FPFH+RANSAC global registration on the sparse 0.5 m clouds (:81-85) ->
    min correspondence-set-size gate (:86-90);
  * drift consistency check on the transform (roll/pitch/yaw/xyz bounds,
    ``isRegistrationConsistent`` :182-229);
  * overlap extraction (:103-106) + ICP refinement run to convergence with
    the MAPPER's registration type (GICP for every deployed config —
    ``updateRegistrationAlgorithm``, :44-49, rebinds the scan-matcher
    factory with 100 iterations at the place-recognition correspondence
    distance) + refinement fitness gate + second consistency check;
  * 6x6 information matrix from the aligned overlap clouds (:148-150).
"""
from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_tpu.models.adjacency import AdjacencyMatrix
from open3d_slam_tpu.models.constraints import (
    Constraint, ICP_RUN_UNTIL_CONVERGENCE_ITERS, VOXEL_EXPANSION_OVERLAP,
    get_map_voxel_size)
from open3d_slam_tpu.ops import hashgrid, overlap as overlap_ops, ransac
from open3d_slam_tpu.ops import pose_graph as pg_ops, registration as reg_ops
from open3d_slam_tpu.utils import se3
from open3d_slam_tpu.utils.config import MapperParameters


class PlaceRecognition:
    def __init__(self, params: MapperParameters, num_ransac_hypotheses: int = 4096):
        self.params = params
        self.num_ransac_hypotheses = num_ransac_hypotheses
        self._key = jax.random.PRNGKey(7)
        self.recognition_counter = 0
        # ``updateRegistrationAlgorithm`` (PlaceRecognition.cpp:44-49): the
        # refinement uses the MAPPER's registration type (GICP in every
        # deployed config), run to convergence at the place-recognition
        # correspondence distance.
        import dataclasses as _dc
        from open3d_slam_tpu.models.cloud_registration import (
            CloudRegistrationStrategy)
        icp = _dc.replace(
            params.scan_matcher.icp,
            max_num_iter=ICP_RUN_UNTIL_CONVERGENCE_ITERS,
            max_correspondence_distance=(
                params.place_recognition.max_icp_correspondence_distance))
        self.registration = CloudRegistrationStrategy(
            params.scan_matcher.scan_to_map_reg_type, icp)
        self._refine_fn = None   # lazily-built fused refine program
        self._ransac_batched = {}   # K_padded -> jitted batched RANSAC

    def _ransac_batched_fn(self, k_padded: int):
        """ONE jitted program RANSAC-matching the finished submap against
        ``k_padded`` candidate submaps (``lax.map`` over the stacked
        feature clouds) — one dispatch + one pull for the whole candidate
        set instead of a blocking round-trip per pair.  K is padded to a
        power of two (all-false masks -> 0 inliers -> host-rejected) so
        candidate-count changes never retrigger compilation."""
        if k_padded in self._ransac_batched:
            return self._ransac_batched[k_padded]
        p = self.params.place_recognition
        nh = self.num_ransac_hypotheses

        @jax.jit
        def fn(src_sparse: PointCloud, src_feat, tgt_clouds: PointCloud,
               tgt_feats, keys):
            def one(args):
                tgt_pc, tgt_f, key = args
                return ransac.ransac_feature_registration(
                    src_sparse, src_feat, tgt_pc, tgt_f,
                    max_correspondence_distance=p.ransac_max_correspondence_distance,
                    edge_length_similarity=p.correspondence_checker_edge_length,
                    distance_threshold=p.correspondence_checker_distance,
                    num_hypotheses=nh, mutual_filter=True, key=key)
            return jax.lax.map(one, (tgt_clouds, tgt_feats, keys))

        self._ransac_batched[k_padded] = fn
        return fn

    def _build_refine_fn(self):
        """ONE jitted program for the loop-closure refinement: overlap ->
        compact -> prepare target -> register -> correspondences -> scaled
        information matrix, with a single (fitness, T, info, scale) pull —
        the old eager chain paid 6+ blocking tunnel RTTs per candidate
        pair.  The information matrix is computed speculatively (before the
        host fitness/consistency gates — ~30 ms of device work vs an extra
        round-trip when the gates pass)."""
        from open3d_slam_tpu.utils import pointcloud as pclib
        p = self.params.place_recognition
        vox = get_map_voxel_size(self.params.map_builder.map_voxel_size)

        @jax.jit
        def fn(source_full: PointCloud, target_full: PointCloud, T_ransac):
            src_m, tgt_m = overlap_ops.overlapping_masks(
                source_full, target_full, T_ransac,
                VOXEL_EXPANSION_OVERLAP * vox)
            src_masked = source_full.with_(mask=source_full.mask & src_m)
            n_src_full = src_masked.count().astype(jnp.float32)
            source_overlap = pclib.compact_to(
                src_masked, min(source_full.capacity, 32768))
            target_overlap = pclib.compact_to(
                target_full.with_(mask=target_full.mask & tgt_m),
                min(target_full.capacity, 65536))
            info_scale = jnp.maximum(
                1.0, n_src_full /
                jnp.clip(source_overlap.count().astype(jnp.float32), 1.0,
                         None))
            prepared = self.registration.prepare_target(target_overlap)
            icp_res = self.registration.register(source_overlap, prepared,
                                                 T_ransac)
            pts = se3.transform_points(icp_res.transformation,
                                       source_overlap.points)
            idx, d2, found = hashgrid.query_nearest(
                prepared.grid, pts, p.max_icp_correspondence_distance)
            q = prepared.grid.points_sorted[idx]
            info = info_scale * pg_ops.information_matrix_from_correspondences(
                q, found & source_overlap.mask)
            return icp_res.fitness, icp_res.transformation, info

        return fn

    # ------------------------------------------------------------------

    def is_registration_consistent(self, T: np.ndarray) -> bool:
        """Drift bounds (``PlaceRecognition.cpp:182-229``)."""
        p = self.params.place_recognition.consistency_check
        R = T[:3, :3]
        roll, pitch, yaw = [float(x) for x in se3.matrix_to_rpy(jnp.asarray(R, jnp.float32))]
        t = T[:3, 3]
        return (abs(roll) <= p.max_drift_roll and
                abs(pitch) <= p.max_drift_pitch and
                abs(yaw) <= p.max_drift_yaw and
                abs(t[0]) <= p.max_drift_x and
                abs(t[1]) <= p.max_drift_y and
                abs(t[2]) <= p.max_drift_z)

    def get_loop_closure_candidates_idxs(self, map_to_range_sensor: np.ndarray,
                                         submaps, adjacency: AdjacencyMatrix,
                                         last_finished_idx: int,
                                         active_idx: int) -> List[int]:
        """(``PlaceRecognition.cpp:231-284``)."""
        p = self.params.place_recognition
        out = []
        n = submaps.get_num_submaps()
        finished_center = submaps.get_submap(last_finished_idx).get_map_to_submap_center()
        for i in range(n):
            if i == active_idx:
                continue
            id1 = submaps.get_submap(i).id
            id2 = submaps.get_submap(active_idx).id
            if adjacency.is_adjacent(id1, id2):
                continue
            if abs(i - last_finished_idx) == 1 or adjacency.is_adjacent(
                    submaps.get_submap(i).id, submaps.get_submap(last_finished_idx).id):
                continue
            center = submaps.get_submap(i).get_map_to_submap_center()
            distance = float(np.linalg.norm(finished_center - center))
            if distance > p.loop_closure_search_radius:
                continue
            consecutive_threshold = int(math.ceil(
                p.loop_closure_search_radius / self.params.submaps.radius))
            if abs(i - last_finished_idx) <= consecutive_threshold:
                continue
            lc_distance = adjacency.get_distance_to_nearest_loop_closure_submap(
                last_finished_idx)
            if lc_distance < p.min_submaps_between_loop_closures:
                continue
            out.append(i)
        return out

    # ------------------------------------------------------------------
    # Resumable loop-closure job: the reference runs detection in a worker
    # thread concurrent with scan processing (``loopClosureWorker``,
    # ``SlamWrapper.cpp:406-448``); on one chip the equivalent is
    # dispatching each phase's device work, prefetching its outputs, and
    # pulling them a scan later — the replay loop never host-blocks on a
    # multi-hundred-ms closure program.

    def start_loop_closure_job(self, map_to_range_sensor: np.ndarray,
                               submaps, adjacency: AdjacencyMatrix,
                               last_finished_idx: int, active_idx: int,
                               timestamp: float):
        """Candidate gating + batched RANSAC DISPATCH (one program for all
        candidate pairs, outputs prefetched).  Returns a job for
        ``advance_loop_closure_job``, or None when there is nothing to do."""
        from open3d_slam_tpu.utils.device import prefetch_to_host
        source_submap = submaps.get_submap(last_finished_idx)
        if source_submap.fpfh is None:
            return None
        candidates = self.get_loop_closure_candidates_idxs(
            map_to_range_sensor, submaps, adjacency, last_finished_idx, active_idx)
        print(f"considering submap {last_finished_idx} for loop closure, "
              f"num candidate submaps: {len(candidates)}")   # :61-62
        cands = [(i, submaps.get_submap(i)) for i in candidates
                 if submaps.get_submap(i).fpfh is not None]
        if not cands:
            return None
        k = len(cands)
        # ONE fixed bucket for the common case: every distinct batch shape
        # is a separate executable whose per-process first call pays
        # seconds of compile-cache deserialization through the tunnel —
        # padding 1..8 candidates to 8 costs ~40 ms/slot of device work
        # and keeps exactly one program (pre-warmed by SlamWrapper.warmup).
        k_padded = 8 if k <= 8 else 1 << (k - 1).bit_length()
        clouds = [s.feature_cloud for _, s in cands]
        feats = [s.fpfh for _, s in cands]
        pad_cloud = clouds[0].with_(mask=jnp.zeros_like(clouds[0].mask))
        clouds = clouds + [pad_cloud] * (k_padded - k)
        feats = feats + [feats[0]] * (k_padded - k)
        stacked_clouds = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *clouds)
        stacked_feats = jnp.stack(feats)
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, k_padded)
        res = self._ransac_batched_fn(k_padded)(
            source_submap.feature_cloud, source_submap.fpfh,
            stacked_clouds, stacked_feats, keys)
        prefetch_to_host(res.num_inliers, res.transformation)
        return _LoopClosureJob(last_finished_idx, timestamp, cands, res,
                               source_submap.map_cloud)

    def advance_loop_closure_job(self, job) -> bool:
        """Advance one phase; True when the job is complete (then read
        ``job.constraints``)."""
        from open3d_slam_tpu.utils.device import prefetch_to_host
        p = self.params.place_recognition
        if job.phase == "ransac":
            n_inliers_all, T_ransac_all = jax.device_get(
                (job.ransac_res.num_inliers, job.ransac_res.transformation))
            if self._refine_fn is None:
                self._refine_fn = self._build_refine_fn()
            for pair_idx, (i, target_submap) in enumerate(job.cands):
                n_inliers = int(n_inliers_all[pair_idx])
                if n_inliers < p.ransac_min_correspondence_set_size:
                    print(f"REJECTED loop closure, {n_inliers} correspondences, "
                          f"submap {job.source_idx} with {i}")
                    continue
                T_ransac = np.asarray(T_ransac_all[pair_idx], np.float64)
                if not self.is_registration_consistent(T_ransac):
                    print(f"REJECTED loop closure, ransac inconsistent, "
                          f"submap {job.source_idx} with {i}")
                    continue
                out = self._refine_fn(job.source_cloud, target_submap.map_cloud,
                                      jnp.asarray(T_ransac, jnp.float32))
                prefetch_to_host(*out)
                job.refines.append((i, out))
            job.phase = "refine"
            return not job.refines
        assert job.phase == "refine"
        pulled = jax.device_get([out for _, out in job.refines])
        for (i, _), (fitness_a, T_icp_a, info_a) in zip(job.refines, pulled):
            fitness = float(fitness_a)
            if fitness < p.min_refinement_fitness:
                print(f"REJECTED loop closure, refinement score {fitness:.3f}, "
                      f"submap {job.source_idx} with {i}")
                continue
            T_icp = np.asarray(T_icp_a, np.float64)
            if not self.is_registration_consistent(T_icp):
                print(f"REJECTED loop closure, icp inconsistent, "
                      f"submap {job.source_idx} with {i}")
                continue
            job.constraints.append(Constraint(
                source_submap_idx=job.source_idx,
                target_submap_idx=i,
                source_to_target=T_icp,
                information_matrix=np.asarray(info_a, np.float64),
                is_odometry_constraint=False,
                is_information_matrix_valid=True,
                timestamp=job.timestamp,
            ))
            self.recognition_counter += 1
            print(f"ACCEPTED loop closure: submap {job.source_idx} with {i}, "
                  f"fitness {fitness:.3f}")
        return True

    def build_loop_closure_constraints(self, map_to_range_sensor: np.ndarray,
                                       submaps, adjacency: AdjacencyMatrix,
                                       last_finished_idx: int, active_idx: int,
                                       timestamp: float) -> List[Constraint]:
        """(``PlaceRecognition.cpp:50-176``), blocking form: start + run the
        job to completion."""
        job = self.start_loop_closure_job(
            map_to_range_sensor, submaps, adjacency, last_finished_idx,
            active_idx, timestamp)
        if job is None:
            return []
        while not self.advance_loop_closure_job(job):
            pass
        return job.constraints


class _LoopClosureJob:
    __slots__ = ("phase", "source_idx", "timestamp", "cands", "ransac_res",
                 "source_cloud", "refines", "constraints")

    def __init__(self, source_idx, timestamp, cands, ransac_res, source_cloud):
        self.phase = "ransac"
        self.source_idx = source_idx
        self.timestamp = timestamp
        self.cands = cands
        self.ransac_res = ransac_res
        self.source_cloud = source_cloud
        self.refines = []          # [(target_idx, device outputs)]
        self.constraints: List[Constraint] = []
