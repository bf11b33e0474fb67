"""Spatially-bucketed approximate kNN via multi-probe space-filling-curve windows.

The exact tiled kNN in ``knn.py`` is O(N^2) in candidate volume and its
``lax.top_k`` merges dominate at S3DIS scale (80k points -> seconds on a
v5e chip). This module implements the TPU-native alternative: sort points
along a Morton (Z-order) curve, then for each query examine only a
*contiguous window* of curve-sorted candidates around its own position.
Contiguity means zero gathers — every window is a ``dynamic_slice`` — and
one top_k per query tile instead of one per (query tile x key tile) pair,
cutting top_k work by ~N/W (50x at N=80k, W=1k).

A single curve misses neighbours that fall across high-bit curve
boundaries (recall ~83% at k=16). Running 2-3 *probes* with grid origins
shifted by irrational fractions of the scene extent de-correlates the
boundaries; the union of probe candidates reaches >99.5% recall at 3
probes (validated in tests/test_ops.py). This is the same locality
observation the Flash3D paper exploits (PAPERS.md). The reference's CUDA
kNN (libs/pointops/src/knn_query/knn_query_cuda_kernel.cu) is exact, so
models use the exact path at small N and the windowed path only where
exact search is wasteful.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# numpy (not jnp): eager jnp constants stall nested-jit lowering
_BIG = np.float32(1e30)
# Irrational-ish origin shifts (fractions of scene extent) per probe.
_PROBE_SHIFTS = (0.0, 0.331, 0.613, 0.459)


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits are 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(
    coord: jnp.ndarray, mask: jnp.ndarray, shift: float = 0.0
) -> jnp.ndarray:
    """30-bit Z-order codes from bbox-normalised coords, with the grid
    origin shifted by ``shift`` x extent (multi-probe de-correlation).
    Invalid points get the max code so they sort last."""
    big = np.float32(1e30)
    lo = jnp.min(jnp.where(mask[:, None], coord, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], coord, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    lo_s = lo - shift * ext
    scale = 1023.0 / ((1.0 + shift) * ext)
    q = jnp.clip((coord - lo_s[None, :]) * scale[None, :], 0, 1023).astype(jnp.int32)
    code = _part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1) | (_part1by2(q[:, 2]) << 2)
    return jnp.where(mask, code, jnp.iinfo(jnp.int32).max)


def _window_probe(
    coord: jnp.ndarray,  # (N, 3)
    mask: jnp.ndarray,  # (N,)
    k: int,
    tile_q: int,
    window: int,
    shift: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One curve probe. Returns (d2, idx) per original point order, idx in
    original ids. Ranking score is |k|^2 - 2 q.k + |q|^2 reconstituted so
    probes can be merged on comparable values."""
    N = coord.shape[0]
    Np = -(-N // tile_q) * tile_q
    code = morton_code(coord, mask, shift)
    order = jnp.argsort(code)
    c_sorted = jnp.pad(coord[order], ((0, Np - N), (0, 0)))
    pen = jnp.pad(
        jnp.where(mask[order], np.float32(0), _BIG), (0, Np - N),
        constant_values=_BIG,
    )
    k2 = jnp.sum(c_sorted * c_sorted, axis=-1) + pen
    q2 = jnp.sum(c_sorted * c_sorted, axis=-1)

    def q_tile(t):
        qs = t * tile_q
        ws = jnp.clip(qs - (window - tile_q) // 2, 0, max(Np - window, 0))
        qt = lax.dynamic_slice(c_sorted, (qs, 0), (tile_q, 3))
        q2t = lax.dynamic_slice(q2, (qs,), (tile_q,))
        wt = lax.dynamic_slice(c_sorted, (ws, 0), (window, 3))
        k2t = lax.dynamic_slice(k2, (ws,), (window,))
        s = k2t[None, :] - 2.0 * jnp.dot(
            qt, wt.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        neg_d, pos = lax.top_k(-s, k)
        return -neg_d + q2t[:, None], (ws + pos).astype(jnp.int32)

    d2, idx_pos = lax.map(q_tile, np.arange(Np // tile_q))
    d2 = d2.reshape(Np, k)[:N]
    idx_pos = idx_pos.reshape(Np, k)[:N]
    order_pad = jnp.pad(order, (0, Np - N))
    idx_orig = order_pad[idx_pos]
    # Scatter rows back to original query order.
    out_idx = jnp.asarray(np.zeros((N, k), np.int32)).at[order].set(
        idx_orig.astype(jnp.int32)
    )
    out_d2 = jnp.asarray(np.full((N, k), _BIG, np.float32)).at[order].set(d2)
    return out_d2, out_idx


def _merge_probes(d2s, idxs, k):
    """Merge per-probe candidates: sort by candidate id so duplicates are
    adjacent (probe scores for the same id can differ in the last bit, so
    the id — not the score — must be the primary key), mask duplicates,
    then select the k best by score."""
    d2 = jnp.concatenate(d2s, axis=-1)  # (N, P*k)
    idx = jnp.concatenate(idxs, axis=-1)
    idxs_, d2s_ = lax.sort((idx, d2), dimension=1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(idxs_[:, :1], bool), idxs_[:, 1:] == idxs_[:, :-1]], axis=1
    )
    d2s_ = jnp.where(dup, _BIG, d2s_)
    neg_d, pos = lax.top_k(-d2s_, k)
    return -neg_d, jnp.take_along_axis(idxs_, pos, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "window", "probes")
)
def knn_self_spatial(
    coord: jnp.ndarray,  # (B, N, 3)
    mask: Optional[jnp.ndarray] = None,  # (B, N)
    k: int = 16,
    tile_q: int = 512,
    window: int = 1024,
    probes: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN. Same return contract as ``knn.knn_query``:
    (idx, dist, valid) each (B, N, k), ascending distance, the query itself
    always first (distance 0)."""
    B, N, _ = coord.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    coord = lax.stop_gradient(coord.astype(jnp.float32))
    tile_q = min(tile_q, N)
    window = max(min(window, N), tile_q)

    def single(c, m):
        d2s, idxs = [], []
        for p in range(probes):
            d2p, idxp = _window_probe(c, m, k, tile_q, window, _PROBE_SHIFTS[p])
            d2s.append(d2p)
            idxs.append(idxp)
        if probes == 1:
            return d2s[0], idxs[0]
        return _merge_probes(d2s, idxs, k)

    d2, idx = jax.vmap(single)(coord, mask)
    valid = (d2 < _BIG / 2) & mask[:, :, None]
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    sel = jnp.take_along_axis(coord[:, :, None, :], idx[:, :, :, None], axis=1)
    diff = sel - coord[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    dist = jnp.where(valid, dist, 0.0)
    return idx, dist, valid
