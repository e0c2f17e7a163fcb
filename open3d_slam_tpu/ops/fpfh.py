"""FPFH (Fast Point Feature Histograms) on TPU.

Replaces Open3D ``ComputeFPFHFeature`` used for place recognition
(``Submap.cpp:245``, consumed by RANSAC at ``PlaceRecognition.cpp:81-85``).

Same construction as Open3D:
  * pair features (alpha, phi, theta) in the Darboux frame, with the
    source/target swap rule (the point whose normal has the smaller angle to
    the connecting line becomes the source);
  * 11 bins per feature -> 33-dim SPFH, each neighbor adding 100/k;
  * FPFH_i = SPFH_i + normalized sum of distance-weighted neighbor SPFHs
    (each of the three 11-bin blocks renormalized to 100).

TPU design: neighborhoods come from the voxel-hash grid (radius + max_nn
hybrid, like the reference's KDTreeSearchParamHybrid), histograms are built
with broadcast compare + sum (no scatter), and everything is batched over
all points at once.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.ops import hashgrid
from open3d_slam_tpu.utils.pointcloud import PointCloud

_EPS = 1e-12


def _pair_features(p1, n1, p2, n2):
    """Open3D ``ComputePairFeatures``: returns (f1, f2, f3, d) = (alpha,
    phi, theta, dist) with source/target swap.  All args (..., 3)."""
    dp = p2 - p1
    d = jnp.linalg.norm(dp, axis=-1)
    dp_u = dp / jnp.clip(d[..., None], _EPS, None)
    angle1 = jnp.sum(n1 * dp_u, axis=-1)
    angle2 = jnp.sum(n2 * dp_u, axis=-1)
    # Swap so |angle_source| >= |angle_target| is NOT the rule — Open3D swaps
    # when acos|angle1| > acos|angle2|, i.e. when |angle2| > |angle1|.
    swap = jnp.abs(angle2) > jnp.abs(angle1)
    u = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    dp_s = jnp.where(swap[..., None], -dp_u, dp_u)
    f2 = jnp.where(swap, -angle2, angle1)  # phi = u . dp
    v = jnp.cross(dp_s, u)
    v_norm = jnp.linalg.norm(v, axis=-1)
    v_u = v / jnp.clip(v_norm[..., None], _EPS, None)
    w = jnp.cross(u, v_u)
    f1 = jnp.sum(v_u * nt, axis=-1)                        # alpha = v . n_t
    f3 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(u * nt, axis=-1))
    degenerate = (d < _EPS) | (v_norm < _EPS)
    zero = jnp.zeros_like(f1)
    return (jnp.where(degenerate, zero, f1),
            jnp.where(degenerate, zero, f2),
            jnp.where(degenerate, zero, f3),
            d, degenerate)


def _bin11(f1, f2, f3):
    """Open3D binning: 11 bins; f1/f2 in [-1,1], f3 in [-pi,pi]."""
    b1 = jnp.clip(jnp.floor(11.0 * (f1 + 1.0) * 0.5), 0, 10).astype(jnp.int32)
    b2 = jnp.clip(jnp.floor(11.0 * (f2 + 1.0) * 0.5), 0, 10).astype(jnp.int32)
    b3 = jnp.clip(jnp.floor(11.0 * (f3 + jnp.pi) / (2.0 * jnp.pi)), 0, 10).astype(jnp.int32)
    return b1, b2, b3


def _hist(bins: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(N, K) int bins + (N, K) weights -> (N, 11) histogram, scatter-free."""
    arange = jnp.arange(11, dtype=bins.dtype)
    onehot = (bins[..., None] == arange).astype(weights.dtype)  # (N, K, 11)
    return jnp.einsum("nk,nkb->nb", weights, onehot)


@partial(jax.jit, static_argnames=("max_nn", "bucket_size"))
def compute_fpfh(pc: PointCloud, radius, max_nn: int = 100,
                 bucket_size: int = 32) -> jnp.ndarray:
    """FPFH features (N, 33) for all valid points (invalid rows are zero).

    ``pc`` must carry normals.  Hybrid neighborhood = up to ``max_nn``
    nearest within ``radius`` (matches KDTreeSearchParamHybrid).
    """
    assert pc.normals is not None, "FPFH needs normals"
    n_pts = pc.capacity
    grid = hashgrid.build(pc, cell_size=radius)
    # Exact hybrid radius+k neighborhoods (KDTreeSearchParamHybrid parity):
    # at FPFH scale (radius >> point spacing) the bucket-probing search
    # truncates neighborhoods; the MXU brute force is exact and fast at
    # feature-cloud capacities.
    idx, d2, valid = hashgrid.query_radius_bruteforce(grid, pc.points, radius,
                                                      max_neighbors=max_nn)
    q = grid.points_sorted[idx]                       # (N, K, 3)
    nq = grid.normals_sorted[idx]                     # (N, K, 3)
    p = pc.points[:, None, :]
    np_ = pc.normals[:, None, :]

    f1, f2, f3, d, degenerate = _pair_features(p, np_, q, nq)
    # Exclude self (d ~ 0) and invalid neighbors.
    is_self = d < 1e-9
    w_valid = valid & (~is_self) & (~degenerate) & pc.mask[:, None]
    counts = jnp.sum(w_valid.astype(jnp.float32), axis=1)          # (N,)
    hist_incr = jnp.where(counts > 0, 100.0 / jnp.clip(counts, 1.0, None), 0.0)
    wts = w_valid.astype(jnp.float32) * hist_incr[:, None]

    b1, b2, b3 = _bin11(f1, f2, f3)
    spfh = jnp.concatenate([_hist(b1, wts), _hist(b2, wts), _hist(b3, wts)], axis=-1)  # (N, 33)

    # FPFH aggregation: distance-weighted neighbor SPFH sums.
    # Grid arrays are in sorted-slot order; idx indexes slots, so route SPFH
    # through the slot -> original-index permutation.
    spfh_of_slot = spfh[grid.order]
    neigh_spfh = spfh_of_slot[idx]                      # (N, K, 33)
    inv_d = jnp.where(w_valid, 1.0 / jnp.clip(d, 1e-6, None), 0.0)
    agg = jnp.einsum("nk,nkf->nf", inv_d, neigh_spfh)   # (N, 33)
    # Renormalize each 11-bin block to sum 100 (Open3D semantics).
    blocks = agg.reshape(n_pts, 3, 11)
    sums = jnp.sum(blocks, axis=-1, keepdims=True)
    blocks = jnp.where(sums > 0, blocks * (100.0 / jnp.clip(sums, _EPS, None)), 0.0)
    fpfh = spfh + blocks.reshape(n_pts, 33)
    return jnp.where(pc.mask[:, None], fpfh, 0.0)


@partial(jax.jit, static_argnames=("mutual",))
def match_features(feat_a: jnp.ndarray, mask_a: jnp.ndarray,
                   feat_b: jnp.ndarray, mask_b: jnp.ndarray,
                   mutual: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-neighbor correspondences in 33-dim feature space via one
    (A, B) distance matmul — the MXU replacement for Open3D's feature
    KD-tree inside RANSAC.

    Returns (index_in_b for each a, valid mask).
    """
    # ||a-b||^2 = |a|^2 + |b|^2 - 2ab
    a2 = jnp.sum(feat_a * feat_a, axis=-1, keepdims=True)
    b2 = jnp.sum(feat_b * feat_b, axis=-1)
    ab = feat_a @ feat_b.T
    d2 = a2 + b2[None, :] - 2.0 * ab
    d2 = jnp.where(mask_b[None, :], d2, jnp.inf)
    nn_ab = jnp.argmin(d2, axis=1)
    valid = mask_a & jnp.isfinite(jnp.min(d2, axis=1))
    if mutual:
        d2_T = jnp.where(mask_a[:, None], d2, jnp.inf)
        nn_ba = jnp.argmin(d2_T, axis=0)
        valid = valid & (nn_ba[nn_ab] == jnp.arange(feat_a.shape[0]))
    return nn_ab, valid
