"""Fused Pallas TPU kernel for one point-to-plane ICP Gauss-Newton iteration.

The correspondence search + residual/Jacobian reduction is THE hot loop of
the whole framework (reference: Open3D ``RegistrationICP``'s per-iteration
KD-tree search + point-to-plane solve, ``CloudRegistration.cpp:44-48``).
The unfused TPU pipeline pays for it three times per iteration:

  1. an exact-NN kernel (MXU matmul at HIGHEST precision = 6 bf16 passes
     over a K=3 contraction -> ~2% MXU utilization),
  2. an XLA row gather of the winners' target points/normals (TPU gathers
     lower to per-row dynamic slices: ~5.7 ms for 8192 rows), and
  3. XLA glue for the 6x6 JtJ / 6 Jtr reduction.

This kernel does all of it in ONE pass over (query-block, target-tile) with
everything resident in VMEM:

  * squared distances in *difference form* on the VPU — exact f32, no
    precision workarounds, no MXU underutilization:
    ``d2 = (qx-tx)^2 + (qy-ty)^2 + (qz-tz)^2``;
  * running (min, argmin) per query across target tiles (flash-attention
    style revisit of the output block);
  * the winner's normal and plane offset ``c = n.q_t`` are extracted
    *in-tile* with a one-hot select+row-reduce — no gather ever touches HBM;
  * at the last tile: residual ``r = n.p - c``, Jacobian ``J = [p x n, n]``,
    and a single (BM,7)^T @ (BM,7) MXU matmul yields the block's
    [JtJ | Jtr; Jtr^T | r^T r] Gram matrix, accumulated with the inlier
    count and d2 sum into one (8,128) output block shared by all blocks.

One kernel call == one full GN normal-equation build: the ICP while_loop
body becomes kernel -> 6x6 Cholesky solve -> SE(3) update.

Batching is native (leading grid dimension), NOT jax.vmap of pallas_call —
vmapped pallas compiles pathologically on some TPU runtimes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # plain float: jnp scalars would be captured kernel constants


def _pick_block(n: int, candidates) -> Optional[int]:
    for c in candidates:
        if n % c == 0 and n >= c:
            return c
    return None


def supports(m: int, n: int) -> bool:
    """Whether the fused kernel tiles these source/target capacities."""
    return (_pick_block(m, (256, 128, 64, 32, 16, 8)) is not None
            and _pick_block(n, (2048, 1024, 512, 256, 128)) is not None)


def _p2l_tile(r2_ref, q, qm, t, tn, tc, tv, out_ref, bd2, bs):
    """One (query-block, target-tile) step; q (BM,3), target side (., BN)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    nb = pl.num_programs(2)

    d0 = q[:, 0:1] - t[0:1, :]
    d1 = q[:, 1:2] - t[1:2, :]
    d2_ = q[:, 2:3] - t[2:3, :]
    d2 = d0 * d0 + d1 * d1 + d2_ * d2_              # (BM, BN) exact f32
    d2 = jnp.where(tv[0:1, :] > 0.0, d2, _BIG)

    tile_min = jnp.min(d2, axis=1, keepdims=True)               # (BM, 1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    is_sel = cols == tile_arg                                   # one col/row

    zero = jnp.zeros_like(d2)
    sel_nx = jnp.sum(jnp.where(is_sel, tn[0:1, :], zero), axis=1, keepdims=True)
    sel_ny = jnp.sum(jnp.where(is_sel, tn[1:2, :], zero), axis=1, keepdims=True)
    sel_nz = jnp.sum(jnp.where(is_sel, tn[2:3, :], zero), axis=1, keepdims=True)
    sel_c = jnp.sum(jnp.where(is_sel, tc[0:1, :], zero), axis=1, keepdims=True)
    tile_s = jnp.concatenate([sel_nx, sel_ny, sel_nz, sel_c], axis=1)  # (BM,4)

    @pl.when(j == 0)
    def _():
        bd2[:, :] = tile_min
        bs[:, :] = tile_s

    @pl.when(j > 0)
    def _():
        better = tile_min < bd2[:, :]
        bd2[:, :] = jnp.where(better, tile_min, bd2[:, :])
        bs[:, :] = jnp.where(better, tile_s, bs[:, :])

    @pl.when(j == nb - 1)
    def _():
        best_d2 = bd2[:, :]                                     # (BM, 1)
        r2 = r2_ref[0, 0]
        wf = jnp.where((best_d2 <= r2) & (qm > 0.0), 1.0, 0.0)
        n0 = bs[:, 0:1]
        n1 = bs[:, 1:2]
        n2 = bs[:, 2:3]
        c = bs[:, 3:4]
        p0 = q[:, 0:1]
        p1 = q[:, 1:2]
        p2 = q[:, 2:3]
        r = p0 * n0 + p1 * n1 + p2 * n2 - c                      # n.p - n.q_t
        jw0 = p1 * n2 - p2 * n1                                  # p x n
        jw1 = p2 * n0 - p0 * n2
        jw2 = p0 * n1 - p1 * n0
        G = jnp.concatenate([jw0, jw1, jw2, n0, n1, n2, r], axis=1) * wf
        GtG = jax.lax.dot_general(
            G, G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # (7, 7)
        n_in = jnp.sum(wf)
        d2s = jnp.sum(wf * best_d2)
        # Assemble the (8, 128) output block scatter-free (Mosaic has no
        # scatter): pad GtG right, append a stats row built from iota masks.
        top = jnp.concatenate(
            [GtG, jnp.zeros((7, 121), jnp.float32)], axis=1)     # (7, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats = jnp.where(lane == 0, n_in, 0.0) + jnp.where(lane == 1, d2s, 0.0)
        contrib = jnp.concatenate([top, stats], axis=0)          # (8, 128)

        @pl.when(i == 0)
        def _():
            out_ref[0] = contrib

        @pl.when(i > 0)
        def _():
            out_ref[0] = out_ref[0] + contrib


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def p2l_normal_eq(q_pts: jnp.ndarray, q_mask_f: jnp.ndarray,
                  t_t: jnp.ndarray, tn_t: jnp.ndarray,
                  tc: jnp.ndarray, tv: jnp.ndarray, r2: jnp.ndarray,
                  block_m: int = 256, block_n: int = 2048,
                  interpret: bool = False) -> jnp.ndarray:
    """Batched fused p2l normal equations.

    Args:
      q_pts:    (B, M, 3) f32 — already-transformed source points.
      q_mask_f: (M, 1) or (B, M, 1) f32 — 1.0 valid / 0.0 padding; without a
        leading batch dim the mask is shared across the batch.
      t_t:      (3, N) or (B, 3, N) f32 — target points, TRANSPOSED; 2-D
        target-side arrays are shared across the batch (multi-start
        localization: 1024 hypotheses against ONE map, stored once in HBM).
      tn_t:     like ``t_t`` — target unit normals, transposed.
      tc:       (1, N) or (B, 1, N) f32 — per-target plane offset n.t.
      tv:       (1, N) or (B, 1, N) f32 — 1.0 valid target / 0.0 padding.
      r2:       (1, 1) f32 — squared max correspondence distance.

    Returns (B, 8, 128): rows 0..6 x cols 0..6 = [JtJ Jtr; Jtr^T rWr];
    row 7 col 0 = inlier count, col 1 = sum of inlier squared distances.
    """
    b, m, _ = q_pts.shape
    n = t_t.shape[-1]
    assert m % block_m == 0 and n % block_n == 0, (m, n, block_m, block_n)
    grid = (b, m // block_m, n // block_n)

    def _spec(arr, blk2, tgt_side):
        """BlockSpec for an array that may or may not carry the batch dim."""
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

    def kernel(r2_ref, qp_ref, qm_ref, t_ref, tn_ref, tc_ref, tv_ref,
               out_ref, bd2, bs):
        def sq(ref):  # squeeze the leading batch-block dim if present
            x = ref[...]
            return x[0] if x.ndim == 3 else x
        _p2l_tile(r2_ref, qp_ref[0], sq(qm_ref), sq(t_ref), sq(tn_ref),
                  sq(tc_ref), sq(tv_ref), out_ref, bd2, bs)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_m, 3), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _spec(q_mask_f, (block_m, 1), tgt_side=False),
            _spec(t_t, (3, block_n), tgt_side=True),
            _spec(tn_t, (3, block_n), tgt_side=True),
            _spec(tc, (1, block_n), tgt_side=True),
            _spec(tv, (1, block_n), tgt_side=True),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 4), jnp.float32),
        ],
        interpret=interpret,
    )(r2, q_pts, q_mask_f, t_t, tn_t, tc, tv)


def prepare_target(points_sorted: jnp.ndarray, normals_sorted: jnp.ndarray,
                   valid: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Precompute the kernel's loop-invariant target-side arrays.

    points/normals: (..., N, 3); valid: (..., N) bool.
    Returns (t_t, tn_t, tc, tv) shaped (..., 3, N) / (..., 1, N).
    """
    t_t = jnp.swapaxes(points_sorted, -1, -2)
    tn_t = jnp.swapaxes(normals_sorted, -1, -2)
    tc = jnp.sum(points_sorted * normals_sorted, axis=-1)[..., None, :]
    tv = valid.astype(jnp.float32)[..., None, :]
    return t_t, tn_t, tc, tv


def unpack(out: jnp.ndarray):
    """Split kernel output (..., 8, 128) -> (JtJ, Jtr, n_inlier, d2_sum)."""
    JtJ = out[..., 0:6, 0:6]
    Jtr = out[..., 0:6, 6]
    n_in = out[..., 7, 0]
    d2s = out[..., 7, 1]
    return JtJ, Jtr, n_in, d2s
