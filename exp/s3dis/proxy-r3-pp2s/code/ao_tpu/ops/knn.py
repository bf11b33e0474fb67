"""Fixed-shape batched k-nearest-neighbour search.

TPU-native replacement for the reference's CUDA heap kNN
(reference: libs/pointops/src/knn_query/knn_query_cuda_kernel.cu:60-104 and
functions/query.py:7-24). Instead of a per-thread heap over an offset-packed
ragged batch, we compute squared distances in (tile_q x tile_k) blocks —
the -2*q.k term rides the MXU — and merge a running top-k with
``lax.top_k`` over the concatenated candidate set. Batches are dense
``(B, N, 3)`` with validity masks; invalid keys are pushed to +inf so they
are never selected. The ranking uses ``|k|^2 - 2 q.k`` only (the ``|q|^2``
term is constant per query row) and the true distance is reconstituted at
the end.

Returns indices sorted by ascending distance (ties broken deterministically
by earlier tile / lower index), mirroring the reference's sorted output.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# numpy (not jnp) so nested-jit lowering embeds it without a device sync
_BIG = np.float32(1e30)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _knn_single(
    query: jnp.ndarray,  # (M, 3) f32, padded to tile_q multiple
    keys: jnp.ndarray,  # (N, 3) f32, padded to tile_k multiple
    key_penalty: jnp.ndarray,  # (N,) f32, 0 for valid keys, _BIG for invalid
    k: int,
    tile_q: int,
    tile_k: int,
    exclude_self: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    M, N = query.shape[0], keys.shape[0]
    num_q_tiles = M // tile_q
    num_k_tiles = N // tile_k
    k2 = jnp.sum(keys * keys, axis=-1) + key_penalty  # (N,)

    def q_tile(qs):
        qt = lax.dynamic_slice(query, (qs * tile_q, 0), (tile_q, 3))  # (tq, 3)
        q_row = qs * tile_q + lax.broadcasted_iota(jnp.int32, (tile_q, 1), 0)

        def k_tile(carry, ks):
            best_d, best_i = carry  # (tq, k)
            kt = lax.dynamic_slice(keys, (ks * tile_k, 0), (tile_k, 3))
            k2t = lax.dynamic_slice(k2, (ks * tile_k,), (tile_k,))
            # score = |k|^2 - 2 q.k  (MXU matmul); |q|^2 added back later.
            # HIGHEST precision: the default f32 matmul runs in bf16 on the
            # MXU, whose ~3e-3 relative error misranks near-tied neighbours.
            s = k2t[None, :] - 2.0 * jnp.dot(
                qt,
                kt.T,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )  # (tq, tk)
            cand_i = ks * tile_k + lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 1)
            if exclude_self:
                s = jnp.where(cand_i == q_row, _BIG, s)
            d_all = jnp.concatenate([best_d, s], axis=1)
            i_all = jnp.concatenate([best_i, cand_i], axis=1)
            neg_top, top_arg = lax.top_k(-d_all, k)
            new_i = jnp.take_along_axis(i_all, top_arg, axis=1)
            return (-neg_top, new_i), None

        init = (
            jnp.asarray(np.full((tile_q, k), _BIG, np.float32)),
            jnp.asarray(np.zeros((tile_q, k), np.int32)),
        )
        (best_d, best_i), _ = lax.scan(k_tile, init, np.arange(num_k_tiles))
        return best_d, best_i

    d, i = lax.map(q_tile, np.arange(num_q_tiles))  # (nq, tq, k)
    return d.reshape(M, k), i.reshape(M, k)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "tile_k", "exclude_self")
)
def knn(
    query_coord: jnp.ndarray,  # (B, M, 3)
    key_coord: jnp.ndarray,  # (B, N, 3)
    k: int,
    query_mask: Optional[jnp.ndarray] = None,  # (B, M) bool
    key_mask: Optional[jnp.ndarray] = None,  # (B, N) bool
    tile_q: int = 512,
    tile_k: int = 1024,
    exclude_self: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched masked kNN.

    Returns ``(idx, dist, valid)`` with shapes ``(B, M, k)``: int32 indices
    into the key axis (ascending distance), Euclidean distances (sqrt, like
    the reference wrapper), and a validity mask (False where fewer than k
    valid keys exist or the query itself is padding). Indices are always
    in-range for safe gathering.
    """
    B, M, _ = query_coord.shape
    N = key_coord.shape[1]
    if query_mask is None:
        query_mask = jnp.ones((B, M), bool)
    if key_mask is None:
        key_mask = jnp.ones((B, N), bool)

    # kNN is index selection: no useful gradient flows through it.
    query_coord = lax.stop_gradient(query_coord.astype(jnp.float32))
    key_coord = lax.stop_gradient(key_coord.astype(jnp.float32))

    tile_q = min(tile_q, _ceil_to(M, 8))
    tile_k = min(tile_k, _ceil_to(N, 128))
    Mp, Np = _ceil_to(M, tile_q), _ceil_to(N, tile_k)
    qp = jnp.pad(query_coord, ((0, 0), (0, Mp - M), (0, 0)))
    kp = jnp.pad(key_coord, ((0, 0), (0, Np - N), (0, 0)))
    penalty = jnp.where(
        jnp.pad(key_mask, ((0, 0), (0, Np - N))), np.float32(0), _BIG
    )

    d2, idx = jax.vmap(
        lambda q, kk, p: _knn_single(q, kk, p, k, tile_q, tile_k, exclude_self)
    )(qp, kp, penalty)
    d2 = d2[:, :M]
    idx = idx[:, :M]

    valid = (d2 < _BIG / 2) & query_mask[:, :, None]
    # Recompute exact distances for the selected neighbours only: the ranking
    # score |k|^2 - 2 q.k + |q|^2 cancels catastrophically near zero, while a
    # direct subtract-square over (B, M, k, 3) is exact and cheap.
    sel = jnp.take_along_axis(key_coord[:, :, None, :], idx[:, :, :, None], axis=1)
    diff = sel - query_coord[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    dist = jnp.where(valid, dist, 0.0)
    return idx, dist, valid


def knn_query(k: int, coord: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
              **kwargs):
    """Self-kNN convenience mirroring ``pointops.knn_query`` (the point
    itself is included as its own nearest neighbour, as in the reference)."""
    return knn(coord, coord, k, mask, mask, **kwargs)
