"""Pallas TPU kernel: fused windowed kNN (distance matmul + top-k).

The XLA path in ao_tpu.ops.knn_spatial computes a (tile_q, window) score
tile with an MXU matmul, then runs ``lax.top_k`` — whose generic sort
lowering dominates the whole op (~0.26 ms per (512,1024) tile on v5e).
This kernel keeps the score tile in VMEM and extracts the k smallest by
k rounds of (min-reduce, argmin-mask) on the VPU — O(k*W) work instead of
a sort, with zero HBM round-trips for the intermediate tile.

The curve-sorted key cloud of one batch element fits VMEM whole (80k pts
= 1 MB), so each query tile's candidate window is a dynamic VMEM slice;
window starts are scalar-prefetched (host side of the jit computes them
from searchsorted positions, 128-aligned for Mosaic). The batch rides the
outer grid dimension — one key cloud resident per batch step. Replaces
the CUDA heap kNN of the reference
(libs/pointops/src/knn_query/knn_query_cuda_kernel.cu:60-104).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(1e30)


def _knn_window_kernel(ws_ref, q_ref, keys_ref, k2_ref, order_ref,
                       d2_ref, idx_ref, *, k: int, window: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # window starts are pre-rounded to 128 on the host (Mosaic requires
    # lane-dim dynamic slices to be 128-aligned)
    ws = pl.multiple_of(ws_ref[b, t], 128)
    qt = q_ref[0]  # (TQ, 3)
    # keys live transposed (3, Nk): lanes = Nk, so VMEM is not blown up by
    # padding a 3-wide lane dim to 128
    wt = keys_ref[0, :, pl.ds(ws, window)]  # (3, W)
    k2t = k2_ref[0, 0, pl.ds(ws, window)]  # (W,)
    ids = order_ref[0, 0, pl.ds(ws, window)]  # (W,) original point ids
    s = k2t[None, :] - 2.0 * jax.lax.dot_general(
        qt,
        wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (TQ, W)

    tq = qt.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (tq, window), 1)
    imax = jnp.int32(np.iinfo(np.int32).max)
    d2_cols = []
    idx_cols = []
    for _ in range(k):
        m = jnp.min(s, axis=1)  # (TQ,)
        am = jnp.min(jnp.where(s <= m[:, None], col, window), axis=1)
        # emit ORIGINAL point ids directly (the order table slice is
        # VMEM-contiguous here; doing the remap outside the kernel is a
        # pathological element-wise XLA gather)
        oid = jnp.min(jnp.where(col == am[:, None], ids[None, :], imax), axis=1)
        d2_cols.append(m)
        idx_cols.append(oid)
        s = jnp.where(col == am[:, None], _BIG, s)
    d2_ref[0] = jnp.stack(d2_cols, axis=1)
    idx_ref[0] = jnp.stack(idx_cols, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "window", "interpret")
)
def knn_window_pallas(
    keys_sorted: jnp.ndarray,  # (B, Nk, 3) curve-sorted (transposed internally)
    k2: jnp.ndarray,  # (B, Nk) |k|^2 + invalid penalty
    order: jnp.ndarray,  # (B, Nk) original point id per sorted position
    queries_sorted: jnp.ndarray,  # (B, Nqp, 3) curve-sorted queries
    window_starts: jnp.ndarray,  # (B, Nqp // tile_q) int32, 128-aligned
    k: int,
    tile_q: int,
    window: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (d2 (B, Nqp, k) ranking scores, idx (B, Nqp, k) ORIGINAL
    key ids), ascending by score."""
    B, nq, _ = queries_sorted.shape
    nk = keys_sorted.shape[1]
    num_tiles = nq // tile_q
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_q, 3), lambda b, t, ws: (b, t, 0)),
            pl.BlockSpec((1, 3, nk), lambda b, t, ws: (b, 0, 0)),
            pl.BlockSpec((1, 1, nk), lambda b, t, ws: (b, 0, 0)),
            pl.BlockSpec((1, 1, nk), lambda b, t, ws: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, t, ws: (b, t, 0)),
            pl.BlockSpec((1, tile_q, k), lambda b, t, ws: (b, t, 0)),
        ],
    )
    kernel = functools.partial(_knn_window_kernel, k=k, window=window)
    d2, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, nq, k), jnp.float32),
            jax.ShapeDtypeStruct((B, nq, k), jnp.int32),
        ],
        interpret=interpret,
    )(
        window_starts,
        queries_sorted,
        jnp.transpose(keys_sorted, (0, 2, 1)),
        k2[:, None, :],
        order[:, None, :],
    )
    # Keep the kernel outputs out of downstream fusions: inside a large jit
    # XLA otherwise tries to hold the whole (B, N, k) result tuple in VMEM
    # (S(1)) and trips the 16 MB scoped-vmem limit.
    d2, idx = jax.lax.optimization_barrier((d2, idx))
    return d2, idx
