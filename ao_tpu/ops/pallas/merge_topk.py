"""Pallas TPU kernel: merge multi-probe kNN candidates with dedup.

The XLA merge (lax.sort by candidate id + top_k over P*k columns,
ops/knn_spatial._merge_probes) costs ~17 ms at (2, 40960, 48) on v5e —
comparable to the window search itself. This kernel does the same thing
as k rounds of (min-reduce over P*k scores, emit, mask *all* slots holding
the emitted candidate id) on the VPU: duplicate candidates from different
probes are suppressed the moment their id is first emitted, so no sort is
needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

_BIG = np.float32(1e30)


def _merge_kernel(d2_ref, idx_ref, out_d2_ref, out_idx_ref, *, k: int):
    s = d2_ref[0]  # (T, P*k)
    ids = idx_ref[0]
    width = s.shape[1]
    col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # Pack (score, column) into one f32: scores are non-negative, so
    # their bit patterns order like the floats; stealing the 6 mantissa
    # LSBs for the column (P*k <= 64) makes a single min reduce return
    # the min score AND a deterministic argmin column (lowest column on
    # ties). Score error from the truncation is <= 2^-17 relative —
    # far below the f32 distance noise of the window search itself.
    # clamp to the smallest NORMAL float before bit-packing: a zero or
    # denormal score (self-edge d2=0) would pack to a denormal, which the
    # TPU VPU flushes to zero — corrupting the stolen argmin-column bits
    s = jnp.maximum(s, jnp.float32(np.finfo(np.float32).tiny))
    sbits = lax.bitcast_convert_type(s, jnp.int32)
    packed = lax.bitcast_convert_type(
        (sbits & jnp.int32(~63)) | col, jnp.float32
    )
    big_packed = jnp.float32(_BIG)
    d2_cols = []
    idx_cols = []
    imax = jnp.int32(np.iinfo(np.int32).max)
    for _ in range(k):
        m = jnp.min(packed, axis=1)  # (T,) min score with its column
        am = lax.bitcast_convert_type(m, jnp.int32) & 63
        # gather-free id select: reduce over the argmin column
        chosen = jnp.min(
            jnp.where(col == am[:, None], ids, imax), axis=1
        )  # (T,)
        d2_cols.append(lax.bitcast_convert_type(
            lax.bitcast_convert_type(m, jnp.int32) & jnp.int32(~63),
            jnp.float32,
        ))
        idx_cols.append(chosen)
        # mask every slot holding the emitted candidate id (dedup) —
        # only where still active, so an id never re-emits
        packed = jnp.where(
            (ids == chosen[:, None]) & (packed < big_packed / 2),
            big_packed, packed,
        )
    out_d2_ref[0] = jnp.stack(d2_cols, axis=1)
    out_idx_ref[0] = jnp.stack(idx_cols, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def merge_topk_dedup(
    d2: jnp.ndarray,  # (B, N, P*k) scores (_BIG = missing)
    idx: jnp.ndarray,  # (B, N, P*k) candidate ids
    k: int,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, N, width = d2.shape
    if width > 64:
        raise ValueError(
            f"merge_topk_dedup packs the argmin column into 6 mantissa bits;"
            f" candidate width {width} > 64 would corrupt scores/ids —"
            f" use the XLA sort-merge fallback for wide merges"
        )
    Npad = -(-N // tile) * tile
    if Npad != N:
        d2 = jnp.pad(d2, ((0, 0), (0, Npad - N), (0, 0)), constant_values=_BIG)
        idx = jnp.pad(idx, ((0, 0), (0, Npad - N), (0, 0)))
    grid = (B, Npad // tile)
    out_d2, out_idx = pl.pallas_call(
        functools.partial(_merge_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, width), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, width), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, k), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, k), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Npad, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Npad, k), jnp.int32),
        ],
        interpret=interpret,
    )(d2, idx)
    return out_d2[:, :N], out_idx[:, :N]
