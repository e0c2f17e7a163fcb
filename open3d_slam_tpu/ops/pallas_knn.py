"""Pallas TPU kernel: flash-style exact nearest-neighbor search.

The ICP correspondence hot op.  The XLA brute-force path materializes the
(M, N) distance matrix in HBM (~4 GB of traffic per scan-to-map iteration);
this kernel computes distance tiles on the MXU and reduces them to a running
(min, argmin) entirely in VMEM — the same blocking idea as flash attention.

Layout notes (TPU tiling pads the last dim to 128 lanes):
  * target points are stored TRANSPOSED (3, N): N rides the lane dimension,
    so the whole 65k-point table is ~2 MB of VMEM instead of 33 MB;
  * |t|^2 is precomputed as (1, N) with +inf on invalid slots — masking
    rides the distance expansion for free;
  * per (query-block, target-tile) step: one (BM,3) @ (3,C) MXU matmul,
    d2 = |q|^2 + |t|^2 - 2 q.t, tile argmin, running update in the output
    block (revisited across the inner grid dimension).

The f32 expansion can swap near-equidistant neighbors; callers recompute the
winner's exact distance (ops/hashgrid.query_nearest does).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nn_kernel(q_ref, q2_ref, t_ref, t2_ref, idx_ref, d2_ref):
    j = pl.program_id(1)
    n_tile = t_ref.shape[1]

    q = q_ref[:, :]                    # (BM, 3)
    t = t_ref[:, :]                    # (3, C)
    # HIGHEST: default bf16 MXU passes give meter-scale dot errors on
    # |coords|~30 scenes, corrupting the argmin.
    dots = jnp.dot(q, t, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)        # (BM, C) MXU
    d2 = q2_ref[:, :] + t2_ref[:, :] - 2.0 * dots              # (BM, C)

    tile_min = jnp.min(d2, axis=1, keepdims=True)              # (BM, 1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] + j * n_tile

    @pl.when(j == 0)
    def _():
        d2_ref[:, :] = tile_min
        idx_ref[:, :] = tile_arg

    @pl.when(j > 0)
    def _():
        better = tile_min < d2_ref[:, :]
        d2_ref[:, :] = jnp.where(better, tile_min, d2_ref[:, :])
        idx_ref[:, :] = jnp.where(better, tile_arg, idx_ref[:, :])


@partial(jax.jit, static_argnames=("block_m", "block_n"))
def nn_argmin(query_points: jnp.ndarray, target_points_t: jnp.ndarray,
              target_sq_masked: jnp.ndarray,
              block_m: int = 256, block_n: int = 2048):
    """Running argmin of squared distances.

    Args:
      query_points: (M, 3) float32; M must be a multiple of block_m.
      target_points_t: (3, N) float32 (transposed!), N multiple of block_n.
      target_sq_masked: (1, N) float32 — |t|^2 with +inf at invalid slots.

    Returns (best_idx (M,) int32, best_d2_approx (M,) float32).
    """
    m = query_points.shape[0]
    n = target_points_t.shape[1]
    assert m % block_m == 0, (m, block_m)
    assert n % block_n == 0, (n, block_n)
    q2 = jnp.sum(query_points * query_points, axis=1, keepdims=True)  # (M, 1)

    grid = (m // block_m, n // block_n)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
    )(query_points, q2, target_points_t, target_sq_masked)
    return idx[:, 0], d2[:, 0]
