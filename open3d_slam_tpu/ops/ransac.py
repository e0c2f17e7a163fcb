"""Batched RANSAC global registration on TPU.

Replaces Open3D ``RegistrationRANSACBasedOnFeatureMatching`` as used by the
reference's loop-closure detection (``PlaceRecognition.cpp:81-85``): FPFH
feature correspondences + 3-point model sampling + correspondence checkers
(edge length, distance) + inlier scoring, then the caller ICP-refines.

TPU design: instead of Open3D's sequential hypothesize-and-verify loop with
early termination (up to 1e6 iterations), a FIXED batch of hypotheses is
scored fully in parallel (vmap/broadcast, MXU feature matching) and the best
is returned — deterministic, and typically needs far fewer hypotheses than
the sequential budget because every hypothesis is always verified:

  * correspondences: nearest-neighbor in 33-D feature space via one matmul;
  * sampling: ``jax.random`` triplets from the correspondence set;
  * model: Umeyama (point-to-point, matching
    ``TransformationEstimationPointToPoint``);
  * checkers: ``CorrespondenceCheckerBasedOnEdgeLength(0.5)`` and
    ``...BasedOnDistance`` on the sampled triplet (``PlaceRecognition.cpp``
    parameters);
  * scoring: inlier count + RMSE over the full correspondence set at
    ``max_correspondence_distance`` (Open3D scores with a fresh NN search;
    scoring on the feature-correspondence set is the standard fast variant —
    downstream gates re-verify with true-NN fitness).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops.fpfh import match_features
from open3d_slam_tpu.utils.pointcloud import PointCloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RansacResult:
    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray         # inlier fraction over correspondence set
    inlier_rmse: jnp.ndarray
    num_inliers: jnp.ndarray     # int32


def _umeyama_triplet(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform from 3 point pairs (no scaling).  p, q: (3, 3)."""
    p_bar = jnp.mean(p, axis=0)
    q_bar = jnp.mean(q, axis=0)
    H = (p - p_bar).T @ (q - q_bar)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], p.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = q_bar - R @ p_bar
    T = jnp.eye(4, dtype=p.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


@partial(jax.jit, static_argnames=("num_hypotheses", "mutual_filter"))
def ransac_feature_registration(
        source: PointCloud, source_features: jnp.ndarray,
        target: PointCloud, target_features: jnp.ndarray,
        max_correspondence_distance,
        edge_length_similarity: float = 0.9,
        distance_threshold=None,
        num_hypotheses: int = 4096,
        mutual_filter: bool = False,
        key: jax.Array = None) -> RansacResult:
    """Best rigid transform aligning source onto target.

    ``edge_length_similarity`` is Open3D's EdgeLength checker parameter
    (the reference passes ``correspondenceCheckerEdgeLength_ = 0.5``... as
    the similarity threshold).  ``distance_threshold`` defaults to
    ``max_correspondence_distance``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if distance_threshold is None:
        distance_threshold = max_correspondence_distance
    max_dist = jnp.asarray(max_correspondence_distance, jnp.float32)
    dist_thr = jnp.asarray(distance_threshold, jnp.float32)

    # Feature correspondences (source -> target).
    nn_idx, corr_valid = match_features(source_features, source.mask,
                                        target_features, target.mask,
                                        mutual=mutual_filter)
    src_pts = source.points                       # (S, 3)
    tgt_pts = target.points[nn_idx]               # (S, 3)
    n_corr = jnp.sum(corr_valid.astype(jnp.float32))

    # Sample triplets from valid correspondences: draw uniform over the
    # correspondence array; invalid draws are rejected via checker failure
    # (weight sampling by validity via gumbel-free trick: sample indices
    # proportional to validity by resampling from the compacted prefix).
    order = jnp.argsort(~corr_valid)              # valid first
    n_valid = jnp.maximum(jnp.sum(corr_valid.astype(jnp.int32)), 1)
    draws = jax.random.randint(key, (num_hypotheses, 3), 0, 1 << 30)
    draws = draws % n_valid
    samp = order[draws]                           # (H, 3) indices into corr arrays
    p3 = src_pts[samp]                            # (H, 3, 3)
    q3 = tgt_pts[samp]

    T_h = jax.vmap(_umeyama_triplet)(p3, q3)      # (H, 4, 4)

    # Checker: edge length similarity (both directions), like Open3D.
    def edge_lengths(x):
        e01 = jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1)
        e12 = jnp.linalg.norm(x[:, 1] - x[:, 2], axis=-1)
        e02 = jnp.linalg.norm(x[:, 0] - x[:, 2], axis=-1)
        return jnp.stack([e01, e12, e02], axis=-1)

    es = edge_lengths(p3)
    et = edge_lengths(q3)
    sim = jnp.asarray(edge_length_similarity, jnp.float32)
    ok_edge = jnp.all((es > sim * et) & (et > sim * es), axis=-1)
    # Checker: distance on the sampled triplet after transform.
    p3_t = jnp.einsum("hij,hkj->hki", T_h[:, :3, :3], p3) + T_h[:, None, :3, 3]
    ok_dist = jnp.all(jnp.linalg.norm(p3_t - q3, axis=-1) < dist_thr, axis=-1)
    ok = ok_edge & ok_dist
    # Distinct sample indices (degenerate triplets).
    distinct = ((samp[:, 0] != samp[:, 1]) & (samp[:, 1] != samp[:, 2]) &
                (samp[:, 0] != samp[:, 2]))
    ok = ok & distinct

    # Score all hypotheses over the full correspondence set, chunked over H
    # to bound memory: (H_chunk, S) distances.
    H = num_hypotheses
    CH = 256
    w_corr = corr_valid.astype(jnp.float32)

    def score_chunk(T_chunk):
        p_t = jnp.einsum("hij,sj->hsi", T_chunk[:, :3, :3], src_pts) + T_chunk[:, None, :3, 3]
        d2 = jnp.sum((p_t - tgt_pts[None]) ** 2, axis=-1)       # (CH, S)
        inl = (d2 < max_dist * max_dist) & corr_valid[None, :]
        cnt = jnp.sum(inl.astype(jnp.float32), axis=-1)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0), axis=-1) /
                        jnp.clip(cnt, 1.0, None))
        return cnt, rmse

    T_chunks = T_h.reshape(H // CH, CH, 4, 4)
    cnts, rmses = jax.lax.map(score_chunk, T_chunks)
    cnts = cnts.reshape(H)
    rmses = rmses.reshape(H)
    cnts = jnp.where(ok, cnts, -1.0)
    # Best by inlier count, ties by lower rmse.
    score = cnts - rmses / jnp.clip(jnp.max(rmses), 1e-6, None) * 0.5
    best = jnp.argmax(score)
    T_best = T_h[best]

    # Final polish: re-estimate from ALL inliers of the winning hypothesis
    # (weighted Umeyama) — tightens the coarse 3-point model before the
    # caller's ICP refinement.
    p_t = src_pts @ T_best[:3, :3].T + T_best[:3, 3]
    d2 = jnp.sum((p_t - tgt_pts) ** 2, axis=-1)
    inl = (d2 < max_dist * max_dist) & corr_valid
    wf = inl.astype(jnp.float32)[:, None]
    n_in = jnp.clip(jnp.sum(wf), 3.0, None)
    p_bar = jnp.sum(src_pts * wf, axis=0) / n_in
    q_bar = jnp.sum(tgt_pts * wf, axis=0) / n_in
    Hm = ((src_pts - p_bar) * wf).T @ (tgt_pts - q_bar)
    U, _, Vt = jnp.linalg.svd(Hm)
    dsign = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(dsign)
    R_ref = Vt.T @ D @ U.T
    t_ref = q_bar - R_ref @ p_bar
    T_refit = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R_ref).at[:3, 3].set(t_ref)
    # Keep the refit only if it does not lose inliers.
    p_t2 = src_pts @ T_refit[:3, :3].T + T_refit[:3, 3]
    d2_2 = jnp.sum((p_t2 - tgt_pts) ** 2, axis=-1)
    inl2 = (d2_2 < max_dist * max_dist) & corr_valid
    cnt2 = jnp.sum(inl2.astype(jnp.float32))
    use_refit = cnt2 >= cnts[best]
    T_final = jnp.where(use_refit, T_refit, T_best)
    cnt_f = jnp.where(use_refit, cnt2, cnts[best])
    d2_f = jnp.where(use_refit, d2_2, d2)
    inl_f = jnp.where(use_refit, inl2, inl)
    rmse_f = jnp.sqrt(jnp.sum(jnp.where(inl_f, d2_f, 0.0)) /
                      jnp.clip(jnp.sum(inl_f.astype(jnp.float32)), 1.0, None))
    return RansacResult(
        transformation=T_final,
        fitness=cnt_f / jnp.clip(n_corr, 1.0, None),
        inlier_rmse=rmse_f,
        num_inliers=jnp.maximum(cnt_f, 0.0).astype(jnp.int32),
    )
