"""Pose-graph optimization: batched robust Gauss-Newton/LM on TPU.

Replaces Open3D's ``GlobalOptimization`` (Levenberg-Marquardt with line-process
robust weights, Choi et al. CVPR'15) used by the reference's
``OptimizationProblem::solve`` (``OptimizationProblem.cpp:25-44``).

Semantics kept from Open3D's ``GlobalOptimizationOption``:
  * certain (odometry) edges always at weight 1;
  * uncertain (loop-closure) edges get Geman-McClure line-process weights
    l = (mu / (mu + r^T I r))^2 with mu = preference_loop_closure *
    mean(information(5,5)) over the graph's edges (Open3D
    ComputeLineProcessWeight — info(5,5) is the correspondence count);
  * two-stage prune-and-reoptimize: uncertain edges with weight <
    edge_prune_threshold after the first LM pass are dropped and the pruned
    graph is re-optimized (CreatePoseGraphWithoutInvalidEdges);
  * the reference node is gauge-fixed with a strong prior.

TPU design: per-edge residuals/Jacobians are batched; the 6Nx6N normal
matrix is assembled with one-hot einsums on the MXU (no scatter), solved by
dense Cholesky.  Problems are capped at a static max node/edge count and
masked, so repeated solves reuse one compilation.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from open3d_slam_tpu.utils import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraphData:
    """Padded pose graph (static capacity)."""

    node_poses: jnp.ndarray      # (N, 4, 4)
    node_mask: jnp.ndarray       # (N,)
    edge_source: jnp.ndarray     # (E,) int32
    edge_target: jnp.ndarray     # (E,) int32
    edge_transform: jnp.ndarray  # (E, 4, 4)  measured source->target
    edge_information: jnp.ndarray  # (E, 6, 6)
    edge_uncertain: jnp.ndarray  # (E,) bool
    edge_mask: jnp.ndarray       # (E,) bool


def _edge_residual(X: jnp.ndarray, e_src, e_tgt, e_T):
    """r = log( T_st^-1 * X_s^-1 * X_t )  per edge, (E, 6)."""
    Xs = X[e_src]
    Xt = X[e_tgt]
    rel = se3.inverse(Xs) @ Xt
    err_T = se3.inverse(e_T) @ rel
    return se3.se3_log(err_T)


def _adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint (..., 6, 6) for xi = (omega, v) ordering."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tx = se3.hat(t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.jit, static_argnames=("max_iterations",))
def optimize(graph: PoseGraphData,
             max_correspondence_distance,
             preference_loop_closure,
             edge_prune_threshold,
             reference_node,
             max_iterations: int = 25,
             damping_init: float = 1e-4) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimize node poses.  Returns (optimized_poses (N,4,4), edge_weights (E,),
    pruned (E,) bool).

    Two-stage, matching Open3D ``GlobalOptimization``: (1) LM with
    line-process reweighting on the full graph; (2) drop uncertain edges
    whose final line-process weight fell below ``edge_prune_threshold``
    (``CreatePoseGraphWithoutInvalidEdges``) and re-optimize on the pruned
    graph.  Both stages are one compiled program.
    """
    N = graph.node_poses.shape[0]
    e_src = graph.edge_source
    e_tgt = graph.edge_target
    e_T = graph.edge_transform
    e_info = graph.edge_information
    e_unc = graph.edge_uncertain
    E = e_src.shape[0]

    # Line-process weight mu (Open3D ComputeLineProcessWeight, Choi et al.
    # CVPR'15 §5): preference_loop_closure * average information(5,5) over
    # the graph's edges — info(5,5) equals the correspondence count for
    # GetInformationMatrixFromPointClouds-style matrices, so mu scales with
    # the information magnitude.  (max_correspondence_distance is part of
    # the option struct but does not enter the line process.)
    n_edges = jnp.clip(jnp.sum(graph.edge_mask.astype(jnp.float32)), 1.0, None)
    avg_corr = jnp.sum(jnp.where(graph.edge_mask, e_info[:, 5, 5], 0.0)) / n_edges
    mu = jnp.asarray(preference_loop_closure, jnp.float32) * avg_corr

    S = jax.nn.one_hot(e_src, N, dtype=jnp.float32)   # (E, N)
    Tm = jax.nn.one_hot(e_tgt, N, dtype=jnp.float32)

    ref_onehot = jax.nn.one_hot(jnp.asarray(reference_node, jnp.int32), N,
                                dtype=jnp.float32)

    def weights(r, e_mask):
        """Line-process weights (E,)."""
        quad = jnp.einsum("ei,eij,ej->e", r, e_info, r)
        w_lc = (mu / (mu + quad)) ** 2
        w = jnp.where(e_unc, w_lc, 1.0)
        return jnp.where(e_mask, w, 0.0)

    def build_normal_eqs(X, w):
        r = _edge_residual(X, e_src, e_tgt, e_T)                 # (E, 6)
        # Right-perturbation Jacobians: J_t = I, J_s = -Ad((X_s^-1 X_t)^-1).
        rel = se3.inverse(X[e_src]) @ X[e_tgt]
        J_s = -_adjoint(se3.inverse(rel))                         # (E, 6, 6)
        lam = e_info * w[:, None, None]                           # (E, 6, 6)
        # Blocks.
        H_ss = jnp.einsum("eki,ekl,elj->eij", J_s, lam, J_s)
        H_st = jnp.einsum("eki,ekj->eij", J_s, lam)               # J_s^T lam I
        H_tt = lam
        b_s = jnp.einsum("eki,ekl,el->ei", J_s, lam, r)
        b_t = jnp.einsum("eij,ej->ei", lam, r)                    # lam r  (J_t = I)
        # Dense assembly via one-hot einsums (N*6 x N*6).
        H = (jnp.einsum("ea,eb,eij->aibj", S, S, H_ss) +
             jnp.einsum("ea,eb,eij->aibj", S, Tm, H_st) +
             jnp.einsum("ea,eb,eij->aibj", Tm, S, jnp.swapaxes(H_st, -1, -2)) +
             jnp.einsum("ea,eb,eij->aibj", Tm, Tm, H_tt))
        b = (jnp.einsum("ea,ei->ai", S, b_s) +
             jnp.einsum("ea,ei->ai", Tm, b_t))
        H = H.reshape(N * 6, N * 6)
        b = b.reshape(N * 6)
        # Gauge prior on the reference node + tiny prior on masked-out nodes
        # to keep H invertible.
        prior = ref_onehot * 1e6 + (1.0 - graph.node_mask.astype(jnp.float32)) * 1e6 + 1e-8
        H = H + jnp.diag(jnp.repeat(prior, 6))
        cost = jnp.sum(w * jnp.einsum("ei,eij,ej->e", r, e_info, r))
        return H, b, cost

    def run_lm(X0, e_mask):
        def lm_step(carry, _):
            X, damping = carry
            w = weights(_edge_residual(X, e_src, e_tgt, e_T), e_mask)
            H, b, cost = build_normal_eqs(X, w)
            Hd = H + damping * jnp.diag(jnp.diag(H))
            L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
            delta = jax.scipy.linalg.cho_solve((L, low), -b)          # (6N,)
            dX = se3.se3_exp(delta.reshape(N, 6))
            X_new = X @ dX
            # Accept if cost decreased (recompute with same weights).
            r_new = _edge_residual(X_new, e_src, e_tgt, e_T)
            cost_new = jnp.sum(w * jnp.einsum("ei,eij,ej->e", r_new, e_info, r_new))
            accept = cost_new < cost
            X = jnp.where(accept, X_new, X)
            damping = jnp.where(accept, damping * 0.5, damping * 4.0)
            damping = jnp.clip(damping, 1e-9, 1e6)
            return (X, damping), cost_new

        (X_opt, _), _ = jax.lax.scan(
            lm_step, (X0, jnp.float32(damping_init)), None,
            length=max_iterations)
        return X_opt

    # Stage 1: full graph.
    X1 = run_lm(graph.node_poses, graph.edge_mask)
    w1 = weights(_edge_residual(X1, e_src, e_tgt, e_T), graph.edge_mask)
    # Stage 2: prune uncertain low-confidence edges and re-optimize
    # (Open3D GlobalOptimization's CreatePoseGraphWithoutInvalidEdges pass).
    thr = jnp.asarray(edge_prune_threshold, jnp.float32)
    pruned = graph.edge_mask & e_unc & (w1 < thr)
    mask2 = graph.edge_mask & ~pruned
    X2 = run_lm(X1, mask2)
    final_w = weights(_edge_residual(X2, e_src, e_tgt, e_T), mask2)
    return X2, final_w, pruned


def information_matrix_from_correspondences(target_points: jnp.ndarray,
                                            corr_mask: jnp.ndarray) -> jnp.ndarray:
    """Open3D ``GetInformationMatrixFromPointClouds`` core: sum over
    correspondences of G^T G with G = [-[q]_x | I] rows (q = target point).

    (Open3D orders G as [skew, identity] w.r.t. (omega, t) — matching our
    xi ordering.)  Returns (6, 6).
    """
    q = target_points
    GtG_rot = -se3.hat(q)                                      # (N, 3, 3)
    G = jnp.concatenate([GtG_rot, jnp.broadcast_to(
        jnp.eye(3, dtype=q.dtype), GtG_rot.shape)], axis=-1)   # (N, 3, 6)
    w = corr_mask.astype(q.dtype)[:, None, None]
    return jnp.einsum("nki,nkj->ij", G * w, G)
