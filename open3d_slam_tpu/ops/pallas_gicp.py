"""Fused Pallas TPU kernel for one Generalized-ICP Gauss-Newton iteration.

GeneralizedIcp is the reference's DEPLOYED default registration type for
both scan2scan and scan2map (``param/default/parameter_structure_definitions
.lua:76,109`` -> Open3D ``RegistrationGeneralizedICP``,
``CloudRegistration.cpp:16-30``), so this kernel — not the point-to-plane
one — is the production hot loop.  Like ``pallas_icp.p2l_normal_eq`` it
fuses, per (query-block, target-tile):

  * exact f32 squared distances in difference form on the VPU;
  * running (min, argmin) per query across target tiles;
  * winner extraction of the target point AND its 6 covariance entries via
    ONE one-hot MXU matmul: ``sel = onehot(BM,BN) @ target_data(9,BN)^T``
    (exact at HIGHEST precision: one-hot rows make every product either 0
    or a 3xbf16-split of the datum, which reassembles exactly in f32);
  * at the last tile, the GICP normal equations: with per-pair weight
    ``M = (C_target + R C_source R^T)^-1`` (plane-to-plane covariances),
    residual ``r = p - q`` and Jacobian ``J = [-hat(p) | I]``,
    factor ``C_sum = L L^T`` (analytic 3x3 Cholesky, lane-wise), forward-
    substitute the 7 right-hand-sides ``[J | r]`` to ``B = L^-1 [J | r]``,
    and accumulate ``JtJ/Jtr`` as ONE (3*BM, 7)^T @ (3*BM, 7) MXU Gram
    matmul — because ``J^T M J = (L^-1 J)^T (L^-1 J)``.

Output layout matches ``pallas_icp``: a (B, 8, 128) block holding
[JtJ | Jtr; Jtr^T | rMr] in rows 0..6 and (inlier count, sum d2) in row 7,
unpacked with ``pallas_icp.unpack``.  Fitness/RMSE stats are EUCLIDEAN
(inlier fraction + RMS correspondence distance), like Open3D's
``RegistrationResult`` — only the normal equations are Mahalanobis-weighted.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_DIAG_EPS = 1e-6   # absolute PD jitter; GICP covariances are O(1) (eigvals in [1e-3, 1])
_SQRT_TINY = 1e-12


def _gicp_tile(r2_ref, q, qm, qc, td, tv, ta, out_ref, bd2, bs):
    """One (query-block, target-tile) step.

    q (BM,3) transformed source points; qm (BM,1) source validity; qc (BM,6)
    rotated source covariance entries [c00,c01,c02,c11,c12,c22]; td (9,BN)
    target rows [x,y,z,c00,c01,c02,c11,c12,c22]; tv (1,BN) target validity;
    ta (1,8) or None — this target tile's AABB [minx..z, maxx..z, 0, 0].

    With ``ta``, the tile's distance sweep is SKIPPED when the query
    block's AABB (valid points only) is farther than max_corr_distance
    from the tile's AABB — EXACT, because any neighbor beyond that
    distance is rejected by the inlier gate anyway.  Pays off when both
    sides are spatially sorted so blocks/tiles are compact.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    nb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        bd2[:, :] = jnp.full(bd2.shape, _BIG, jnp.float32)
        bs[:, :] = jnp.zeros(bs.shape, jnp.float32)

    def sweep():
        d0 = q[:, 0:1] - td[0:1, :]
        d1 = q[:, 1:2] - td[1:2, :]
        d2_ = q[:, 2:3] - td[2:3, :]
        d2 = d0 * d0 + d1 * d1 + d2_ * d2_            # (BM, BN) exact f32
        d2 = jnp.where(tv[0:1, :] > 0.0, d2, _BIG)

        tile_min = jnp.min(d2, axis=1, keepdims=True)             # (BM, 1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        onehot = (cols == tile_arg).astype(jnp.float32)           # (BM, BN)
        # Winner's 9 target values in ONE MXU matmul (exact: one-hot rows).
        tile_s = jax.lax.dot_general(
            onehot, td, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                   # (BM, 9)
        better = tile_min < bd2[:, :]
        bd2[:, :] = jnp.where(better, tile_min, bd2[:, :])
        bs[:, :] = jnp.where(better, tile_s, bs[:, :])

    if ta is None:
        sweep()
    else:
        r2v = r2_ref[0, 0]
        qv = qm > 0.0
        qmin = jnp.min(jnp.where(qv, q, _BIG), axis=0)            # (3,)
        qmax = jnp.max(jnp.where(qv, q, -_BIG), axis=0)
        tmin = ta[0, 0:3]
        tmax = ta[0, 3:6]
        # gap per axis; blocks with no valid point (qmin=BIG) auto-reject.
        gap = jnp.maximum(jnp.maximum(tmin - qmax, qmin - tmax), 0.0)
        pl.when(jnp.sum(gap * gap) <= r2v)(sweep)

    @pl.when(j == nb - 1)
    def _():
        best_d2 = bd2[:, :]                                        # (BM, 1)
        r2 = r2_ref[0, 0]
        wf = jnp.where((best_d2 <= r2) & (qm > 0.0), 1.0, 0.0)
        S = bs[:, :]
        p0, p1, p2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        # C_sum = C_q + R C_p R^T (+ PD jitter on the diagonal).
        a00 = S[:, 3:4] + qc[:, 0:1] + _DIAG_EPS
        a01 = S[:, 4:5] + qc[:, 1:2]
        a02 = S[:, 5:6] + qc[:, 2:3]
        a11 = S[:, 6:7] + qc[:, 3:4] + _DIAG_EPS
        a12 = S[:, 7:8] + qc[:, 4:5]
        a22 = S[:, 8:9] + qc[:, 5:6] + _DIAG_EPS
        # Analytic 3x3 Cholesky C_sum = L L^T, lane-wise on (BM,1) columns.
        l00 = jnp.sqrt(jnp.maximum(a00, _SQRT_TINY))
        inv_l00 = 1.0 / l00
        l10 = a01 * inv_l00
        l20 = a02 * inv_l00
        l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, _SQRT_TINY))
        inv_l11 = 1.0 / l11
        l21 = (a12 - l20 * l10) * inv_l11
        l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, _SQRT_TINY))
        inv_l22 = 1.0 / l22

        # 7 right-hand-sides [J | r]: J = [-hat(p) | I], r = p - q_target.
        zero = jnp.zeros_like(p0)
        one = jnp.ones_like(p0)
        r0 = p0 - S[:, 0:1]
        r1 = p1 - S[:, 1:2]
        r2_ = p2 - S[:, 2:3]
        # rows of J (and r) per rhs column c: (x0[c], x1[c], x2[c])
        x0 = (zero, p2, -p1, one, zero, zero, r0)
        x1 = (-p2, zero, p0, zero, one, zero, r1)
        x2 = (p1, -p0, zero, zero, zero, one, r2_)
        # Forward substitution y = L^-1 x, per column.
        y0 = tuple(c * inv_l00 for c in x0)
        y1 = tuple((x1[k] - l10 * y0[k]) * inv_l11 for k in range(7))
        y2 = tuple((x2[k] - l20 * y0[k] - l21 * y1[k]) * inv_l22
                   for k in range(7))
        row0 = jnp.concatenate(y0, axis=1) * wf                    # (BM, 7)
        row1 = jnp.concatenate(y1, axis=1) * wf
        row2 = jnp.concatenate(y2, axis=1) * wf
        G = jnp.concatenate([row0, row1, row2], axis=0)            # (3BM, 7)
        GtG = jax.lax.dot_general(
            G, G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                    # (7, 7)
        n_in = jnp.sum(wf)
        d2s = jnp.sum(wf * best_d2)
        top = jnp.concatenate(
            [GtG, jnp.zeros((7, 121), jnp.float32)], axis=1)       # (7, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats = jnp.where(lane == 0, n_in, 0.0) + jnp.where(lane == 1, d2s, 0.0)
        contrib = jnp.concatenate([top, stats], axis=0)            # (8, 128)

        @pl.when(i == 0)
        def _():
            out_ref[0] = contrib

        @pl.when(i > 0)
        def _():
            out_ref[0] = out_ref[0] + contrib


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def gicp_normal_eq(q_pts: jnp.ndarray, q_mask_f: jnp.ndarray,
                   q_cov6: jnp.ndarray, td: jnp.ndarray, tv: jnp.ndarray,
                   r2: jnp.ndarray, t_aabb: Optional[jnp.ndarray] = None,
                   block_m: int = 256, block_n: int = 2048,
                   interpret: bool = False) -> jnp.ndarray:
    """Batched fused GICP normal equations.

    Args:
      q_pts:    (B, M, 3) f32 — already-transformed source points.
      q_mask_f: (M, 1) or (B, M, 1) f32 — 1.0 valid / 0.0 padding.
      q_cov6:   (B, M, 6) f32 — source covariance entries [c00,c01,c02,
        c11,c12,c22] ALREADY rotated into the target frame (R C R^T).
      td:       (9, N) or (B, 9, N) f32 — target rows [x, y, z, c00, c01,
        c02, c11, c12, c22]; 2-D is shared across the batch.
      tv:       (1, N) or (B, 1, N) f32 — 1.0 valid target.
      r2:       (1, 1) f32 — squared max correspondence distance.
      t_aabb:   optional (N // block_n, 8) f32 per-tile AABBs
        [minx,miny,minz,maxx,maxy,maxz,0,0] (see ``tile_aabbs``); enables
        the exact AABB-distance tile skip — worthwhile only when source
        and target are spatially sorted.

    Returns (B, 8, 128), unpacked by ``pallas_icp.unpack``.
    """
    b, m, _ = q_pts.shape
    n = td.shape[-1]
    assert m % block_m == 0 and n % block_n == 0, (m, n, block_m, block_n)
    grid = (b, m // block_m, n // block_n)

    def _spec(arr, blk2, tgt_side):
        if arr.ndim == 3:
            if tgt_side:
                return pl.BlockSpec((1,) + blk2, lambda b, i, j: (b, 0, j),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1,) + blk2, lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM)
        if tgt_side:
            return pl.BlockSpec(blk2, lambda b, i, j: (0, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(blk2, lambda b, i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, block_m, 3), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        _spec(q_mask_f, (block_m, 1), tgt_side=False),
        pl.BlockSpec((1, block_m, 6), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        _spec(td, (9, block_n), tgt_side=True),
        _spec(tv, (1, block_n), tgt_side=True),
    ]
    operands = [r2, q_pts, q_mask_f, q_cov6, td, tv]
    if t_aabb is not None:
        # (tiles, 1, 8) with block (1, 1, 8): the TPU lowering requires the
        # last two block dims be (multiple of 8, multiple of 128) OR equal
        # to the array dims — (1, 8) on a (tiles, 8) array is neither.
        in_specs.append(pl.BlockSpec((1, 1, 8), lambda b, i, j: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(t_aabb.reshape(t_aabb.shape[0], 1, 8))

    def kernel(r2_ref, qp_ref, qm_ref, qc_ref, td_ref, tv_ref, *rest):
        *maybe_ta, out_ref, bd2, bs = rest
        ta = maybe_ta[0] if maybe_ta else None

        def sq(ref):
            x = ref[...]
            return x[0] if x.ndim == 3 else x
        _gicp_tile(r2_ref, qp_ref[0], sq(qm_ref), qc_ref[0], sq(td_ref),
                   sq(tv_ref), None if ta is None else ta[0],
                   out_ref, bd2, bs)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 9), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def tile_aabbs(points_sorted: jnp.ndarray, valid: jnp.ndarray,
               block_n: int) -> jnp.ndarray:
    """Per-target-tile AABBs for the kernel's tile skip: (N//block_n, 8)
    rows [minx,miny,minz,maxx,maxy,maxz,0,0].  Invalid points contribute
    +/-BIG so an all-invalid tile never overlaps anything."""
    n = points_sorted.shape[0]
    tiles = points_sorted.reshape(n // block_n, block_n, 3)
    v = valid.reshape(n // block_n, block_n, 1)
    mins = jnp.min(jnp.where(v, tiles, _BIG), axis=1)
    maxs = jnp.max(jnp.where(v, tiles, -_BIG), axis=1)
    pad = jnp.zeros((n // block_n, 2), jnp.float32)
    return jnp.concatenate([mins, maxs, pad], axis=1)


def cov6_from_full(C: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) entries [c00,c01,c02,c11,c12,c22]."""
    return jnp.stack([C[..., 0, 0], C[..., 0, 1], C[..., 0, 2],
                      C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]], axis=-1)


def rotate_cov6(R: jnp.ndarray, cov6: jnp.ndarray) -> jnp.ndarray:
    """Entries of R C R^T from entries of C.  R (..., 3, 3), cov6 (..., N, 6)."""
    c00, c01, c02, c11, c12, c22 = [cov6[..., k] for k in range(6)]
    C = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c01, c11, c12], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)                                                    # (..., N, 3, 3)
    RC = jnp.einsum("...ij,...njk->...nik", R, C)
    RCRt = jnp.einsum("...nik,...jk->...nij", RC, R)
    return cov6_from_full(RCRt)


def prepare_target(points_sorted: jnp.ndarray, covs_sorted: jnp.ndarray,
                   valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loop-invariant target-side arrays: td (..., 9, N), tv (..., 1, N)."""
    pts_t = jnp.swapaxes(points_sorted, -1, -2)                    # (..., 3, N)
    cov_t = jnp.swapaxes(cov6_from_full(covs_sorted), -1, -2)      # (..., 6, N)
    td = jnp.concatenate([pts_t, cov_t], axis=-2)                  # (..., 9, N)
    tv = valid.astype(jnp.float32)[..., None, :]
    return td, tv
