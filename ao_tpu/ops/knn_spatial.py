"""Spatially-bucketed approximate kNN via multi-probe space-filling-curve windows.

The exact tiled kNN in ``knn.py`` is O(N^2) in candidate volume and its
``lax.top_k`` merges dominate at S3DIS scale (80k points -> seconds on a
v5e chip). This module implements the TPU-native alternative: sort points
along a Morton (Z-order) curve, then for each query examine only a
*contiguous window* of curve-sorted candidates around its own position.
Contiguity means zero gathers — every window is a ``dynamic_slice``.

A single curve misses neighbours that fall across high-bit curve
boundaries (recall ~83% at k=16). Running 2-3 *probes* with grid origins
shifted by irrational fractions of the scene extent de-correlates the
boundaries; the union of probe candidates reaches >99.5% recall at 3
probes (validated in tests/test_ops.py). This is the same locality
observation the Flash3D paper exploits (PAPERS.md). The reference's CUDA
kNN (libs/pointops/src/knn_query/knn_query_cuda_kernel.cu) is exact, so
models use the exact path at small N and the windowed path only where
exact search is wasteful.

On TPU the per-tile window search runs in the fused Pallas kernel
(ops/pallas/knn_window.py: MXU distance matmul + VPU k-round min-extract,
batch on the outer kernel grid); on CPU it falls back to ``lax.top_k``.
All bookkeeping (curve sort, searchsorted window placement, inverse-
permutation mapping, probe merging) is written batched — no vmap, so the
kernel's VMEM footprint stays one scene.

Cross-cloud queries (``knn_cross_spatial``, used by interpolation-based
unpooling) quantise both clouds on the key cloud's bbox and centre each
query tile's window on its ``searchsorted`` position among sorted keys.
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


def _use_pallas() -> bool:
    return jax.default_backend() != "cpu"


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits are 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code_with_bbox(coord, mask, lo, hi, shift: float = 0.0):
    """30-bit Z-order codes on an explicit per-scene bbox, grid origin
    shifted by ``shift`` x extent (multi-probe de-correlation). Invalid
    points get the max code so they sort last.

    coord: (B, N, 3); mask: (B, N); lo/hi: (B, 3).
    """
    ext = jnp.maximum(hi - lo, 1e-6)
    lo_s = lo - shift * ext
    scale = 1023.0 / ((1.0 + shift) * ext)
    q = jnp.clip(
        (coord - lo_s[:, None, :]) * scale[:, None, :], 0, 1023
    ).astype(jnp.int32)
    code = (
        _part1by2(q[..., 0]) | (_part1by2(q[..., 1]) << 1)
        | (_part1by2(q[..., 2]) << 2)
    )
    return jnp.where(mask, code, jnp.iinfo(jnp.int32).max)


def morton_code(coord, mask, shift: float = 0.0):
    """Per-scene-bbox Z-order codes; accepts (N,3)/(N,) or batched."""
    squeeze = coord.ndim == 2
    if squeeze:
        coord, mask = coord[None], mask[None]
    big = np.float32(1e30)
    lo = jnp.min(jnp.where(mask[..., None], coord, big), axis=1)
    hi = jnp.max(jnp.where(mask[..., None], coord, -big), axis=1)
    code = morton_code_with_bbox(coord, mask, lo, hi, shift)
    return code[0] if squeeze else code


def _take_rows(x, order):
    """Batched row gather: x (B, N, ...) by order (B, N)."""
    if x.ndim == 3:
        return jnp.take_along_axis(x, order[:, :, None], axis=1)
    return jnp.take_along_axis(x, order, axis=1)


def _window_search(k_sorted, k2, order_k, q_sorted, ws, k, tile_q, window):
    """Per-tile windowed k-smallest search (batched).

    k_sorted (B, Nk, 3), k2 (B, Nk), order_k (B, Nk) original ids,
    q_sorted (B, Nqp, 3), ws (B, T). Returns (scores (B, Nqp, k),
    ORIGINAL key ids (B, Nqp, k)); scores are |key|^2 - 2 q.key."""
    # Pallas path needs a 128-multiple window (Mosaic lane alignment).
    if _use_pallas() and window % 128 == 0 and tile_q % 8 == 0:
        from .pallas.knn_window import knn_window_pallas

        return knn_window_pallas(
            k_sorted, k2, order_k, q_sorted, ws, k, tile_q, window
        )

    B, Nqp, _ = q_sorted.shape

    def q_tile(t):
        def one(ksb, k2b, ob, qsb, wsb):
            qt = lax.dynamic_slice(qsb, (t * tile_q, 0), (tile_q, 3))
            wt = lax.dynamic_slice(ksb, (wsb[t], 0), (window, 3))
            k2t = lax.dynamic_slice(k2b, (wsb[t],), (window,))
            ot = lax.dynamic_slice(ob, (wsb[t],), (window,))
            s = k2t[None, :] - 2.0 * jnp.dot(
                qt, wt.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            kk = min(k, window)
            neg_d, pos = lax.top_k(-s, kk)
            if kk < k:
                neg_d = jnp.pad(
                    neg_d, ((0, 0), (0, k - kk)), constant_values=-_BIG
                )
                pos = jnp.pad(pos, ((0, 0), (0, k - kk)))
            return -neg_d, ot[pos]

        return jax.vmap(one)(k_sorted, k2, order_k, q_sorted, ws)

    d2, idx = lax.map(q_tile, np.arange(Nqp // tile_q))  # (T, B, tq, k)
    d2 = jnp.moveaxis(d2, 0, 1).reshape(B, Nqp, k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, Nqp, k)
    return d2, idx


def _window_probe(query, key, qmask, kmask, k, tile_q, window, shift,
                  self_mode):
    """One curve probe (batched, self or cross). Returns (d2, idx) in
    original query order / original key ids; d2 is the full squared
    distance (|q|^2 reconstituted) so probes merge on comparable values."""
    B, Nq, _ = query.shape
    Nk = key.shape[1]
    Nqp = -(-Nq // tile_q) * tile_q
    # +128 compensates the 128-alignment rounding of window starts (Mosaic
    # dynamic-slice requirement) so effective coverage never shrinks
    window = min(window + 128, Nk)
    big = np.float32(1e30)
    lo = jnp.min(jnp.where(kmask[..., None], key, big), axis=1)
    hi = jnp.max(jnp.where(kmask[..., None], key, -big), axis=1)
    code_k = morton_code_with_bbox(key, kmask, lo, hi, shift)
    order_k = jnp.argsort(code_k, axis=1)
    # mask rides the coord gather as a 4th lane (both pad to 128 lanes —
    # the extra lane is free; a separate (B, N) mask gather is not)
    km = jnp.concatenate(
        [key, kmask.astype(key.dtype)[..., None]], axis=-1
    )
    km_sorted = _take_rows(km, order_k)
    k_sorted = km_sorted[..., :3]
    pen = jnp.where(km_sorted[..., 3] > 0, np.float32(0), _BIG)
    # Pad keys to a 128 multiple so the clip bound (Nk - window) stays
    # 128-aligned: otherwise rounding window starts down uncovers the last
    # <=127 curve positions for tail queries.
    Nkp = -(-Nk // 128) * 128
    k_sorted = jnp.pad(k_sorted, ((0, 0), (0, Nkp - Nk), (0, 0)))
    pen = jnp.pad(pen, ((0, 0), (0, Nkp - Nk)), constant_values=_BIG)
    order_k_pad = jnp.pad(order_k, ((0, 0), (0, Nkp - Nk))).astype(jnp.int32)
    Nk = Nkp
    k2 = jnp.sum(k_sorted * k_sorted, axis=-1) + pen

    T = Nqp // tile_q
    if self_mode:
        order_q = order_k
        # k_sorted is key-padded to a 128 multiple; queries pad to Nqp
        q_sorted = jnp.pad(k_sorted[:, :Nq], ((0, 0), (0, Nqp - Nq), (0, 0)))
        starts = np.arange(T, dtype=np.int32) * tile_q - (window - tile_q) // 2
        ws = jnp.broadcast_to(
            jnp.clip(jnp.asarray(starts), 0, max(Nk - window, 0))[None, :],
            (B, T),
        )
    else:
        code_q = morton_code_with_bbox(query, qmask, lo, hi, shift)
        order_q = jnp.argsort(code_q, axis=1)
        q_sorted_v = _take_rows(query, order_q)
        q_sorted = jnp.pad(q_sorted_v, ((0, 0), (0, Nqp - Nq), (0, 0)))
        code_q_sorted = _take_rows(code_q, order_q)
        # Only the tile-center positions are needed: searchsorted the T
        # center codes, not all Nq queries (the binary-search while loop is
        # row-bound — ~12ms at 40k queries vs microseconds at T~160).
        center_rows = np.arange(T, dtype=np.int32) * tile_q + tile_q // 2
        center_rows = np.minimum(center_rows, Nq - 1)
        center_codes = code_q_sorted[:, center_rows]
        centers = jax.vmap(jnp.searchsorted)(
            _take_rows(code_k, order_k), center_codes
        ).astype(jnp.int32)
        ws = jnp.clip(centers - window // 2, 0, max(Nk - window, 0))
    ws = ((ws // 128) * 128).astype(jnp.int32)

    s, idx_orig = _window_search(
        k_sorted, k2, order_k_pad, q_sorted, ws, k, tile_q, window
    )
    if self_mode:
        # queries ARE the sorted keys: |q|^2 = k2 - pen (pen is 0 on valid
        # rows; invalid rows blow up d2, which their mask discards anyway)
        # — saves a (B, N, 3) row gather per probe (3 -> 128 lane padding
        # makes those gathers 42x their logical bytes).
        q2 = k2[:, :Nq]
        q2 = jnp.pad(q2, ((0, 0), (0, Nqp - Nq)))
    else:
        q_rows = _take_rows(query, order_q)
        q2 = jnp.sum(q_rows * q_rows, axis=-1)
        q2 = jnp.pad(q2, ((0, 0), (0, Nqp - Nq)))
    d2 = (s + q2[:, :, None])[:, :Nq]
    # ids selected from key padding (only when <k valid keys exist) are
    # flagged invalid via their _BIG scores; _finalize clamps before gathers
    idx_orig = jnp.clip(idx_orig[:, :Nq], 0, None).astype(jnp.int32)
    d2 = jnp.where(s[:, :Nq] > _BIG / 2, _BIG, d2)
    # Map rows back to the original query order by inverse permutation
    # (a gather — cheaper and batch-friendly vs scatter). One packed
    # gather for scores+ids, in the INT32 domain: small int ids bitcast
    # to f32 are denormals, which the TPU VPU flushes to zero (every id
    # below ~2^23 would silently become 0 — a bug that cost a round-4
    # training run 0.15 mIoU via zeroed unpool graphs). Score bit
    # patterns ride as int32 lanes instead; integer moves are bit-exact.
    inv_q = jnp.argsort(order_q, axis=1)
    packed = jnp.concatenate(
        [lax.bitcast_convert_type(d2, jnp.int32), idx_orig], axis=-1
    )
    out = _take_rows(packed, inv_q)
    out_d2 = lax.bitcast_convert_type(out[..., :k], jnp.float32)
    out_idx = out[..., k:]
    return out_d2, out_idx


def _merge_probes(d2s, idxs, k):
    """Merge per-probe candidates with duplicate suppression. TPU: Pallas
    min-extract kernel; CPU fallback: sort by candidate id so duplicates
    are adjacent (probe scores for the same id can differ in the last bit,
    so the id — not the score — must be the primary key), mask duplicates,
    then select the k best by score."""
    d2 = jnp.concatenate(d2s, axis=-1)  # (B, N, P*k)
    idx = jnp.concatenate(idxs, axis=-1)
    # The Pallas merge packs the argmin column into the 6 mantissa LSBs of
    # the score, which is only valid for candidate widths <= 64; wider
    # merges (large k or probe counts) take the XLA sort path.
    if _use_pallas() and d2.shape[-1] <= 64:
        from .pallas.merge_topk import merge_topk_dedup

        return merge_topk_dedup(d2, idx, k)
    idxs_, d2s_ = lax.sort((idx, d2), dimension=2, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(idxs_[..., :1], bool), idxs_[..., 1:] == idxs_[..., :-1]],
        axis=-1,
    )
    d2s_ = jnp.where(dup, _BIG, d2s_)
    neg_d, pos = lax.top_k(-d2s_, k)
    return -neg_d, jnp.take_along_axis(idxs_, pos, axis=-1)


def _finalize(d2, idx, query_coord, key_coord, query_mask, exact_dist=True):
    valid = (d2 < _BIG / 2) & query_mask[:, :, None]
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    idx = jnp.minimum(idx, key_coord.shape[1] - 1)
    if exact_dist:
        # subtract-square recompute: the |k|^2-2qk+|q|^2 score cancels
        # catastrophically near zero (needed for IDW interpolation weights)
        sel = jnp.take_along_axis(
            key_coord[:, :, None, :], idx[:, :, :, None], axis=1
        )
        diff = sel - query_coord[:, :, None, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    else:
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    dist = jnp.where(valid, dist, 0.0)
    return idx, dist, valid


def _multi_probe(query, key, qmask, kmask, k, tile_q, window, probes,
                 self_mode):
    d2s, idxs = [], []
    for p in range(probes):
        d2p, idxp = _window_probe(
            query, key, qmask, kmask, k, tile_q, window, _PROBE_SHIFTS[p],
            self_mode,
        )
        d2s.append(d2p)
        idxs.append(idxp)
    if probes == 1:
        return d2s[0], idxs[0]
    return _merge_probes(d2s, idxs, k)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "window", "probes", "exact_dist")
)
def knn_self_spatial(
    coord: jnp.ndarray,  # (B, N, 3)
    mask: Optional[jnp.ndarray] = None,  # (B, N)
    k: int = 16,
    tile_q: int = 256,
    window: int = 1024,
    probes: int = 3,
    exact_dist: bool = True,
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
    d2, idx = _multi_probe(
        coord, coord, mask, mask, k, tile_q, window, probes, self_mode=True
    )
    return _finalize(d2, idx, coord, coord, mask, exact_dist)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "window", "front", "exact_dist")
)
def knn_self_presorted(
    coord: jnp.ndarray,  # (B, N, 3) ALREADY Morton-sorted (invalid last)
    mask: Optional[jnp.ndarray] = None,  # (B, N)
    k: int = 16,
    tile_q: int = 128,
    window: int = 1152,
    front: int = 512,
    exact_dist: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Window-RESTRICTED self-kNN on curve-sorted points.

    Tile ``t``'s queries search exactly rows
    ``[t*tile_q - front, t*tile_q - front + window)`` of the sorted
    array (keys are front-padded so starts never clamp) — sized by the
    caller to lie INSIDE the slab every query tile of the slab-resident
    GVA kernels loads (ops/pallas/gva_slab.py), so every edge is
    in-slab by construction. Missed true neighbours (~8% at a 1024-row
    window on real 80k scenes) are replaced by the next nearest
    in-window points, never dropped. No probe merge, no sort, no
    unsort — the cheapest graph the model can buy. Returned ids index
    the sorted array; ascending distance, self first.
    """
    B, N, _ = coord.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    coord = lax.stop_gradient(coord.astype(jnp.float32))
    if window >= N + front:
        # degenerate: window covers everything — plain exact window search
        return knn_self_spatial(
            coord, mask, k=k, probes=1, exact_dist=exact_dist
        )
    Nqp = -(-N // tile_q) * tile_q
    back = window  # generous tail pad: last tile's window stays in range
    pen = jnp.where(mask, np.float32(0), _BIG)
    k_sorted = jnp.pad(coord, ((0, 0), (front, back + Nqp - N), (0, 0)))
    pen = jnp.pad(
        pen, ((0, 0), (front, back + Nqp - N)), constant_values=_BIG
    )
    k2 = jnp.sum(k_sorted * k_sorted, axis=-1) + pen
    # ids relative to the UNPADDED sorted array (pad rows go negative /
    # past-N; their _BIG scores mark them invalid before _finalize clips)
    order = jnp.broadcast_to(
        jnp.arange(k_sorted.shape[1], dtype=jnp.int32)[None] - front,
        k2.shape,
    )
    q_sorted = jnp.pad(coord, ((0, 0), (0, Nqp - N), (0, 0)))
    T = Nqp // tile_q
    ws = jnp.broadcast_to(
        (jnp.arange(T, dtype=jnp.int32) * tile_q)[None], (B, T)
    )
    s, idx = _window_search(
        k_sorted, k2, order, q_sorted, ws, k, tile_q, window
    )
    q2 = jnp.pad(
        jnp.sum(coord * coord, axis=-1), ((0, 0), (0, Nqp - N))
    )
    d2 = (s + q2[:, :, None])[:, :N]
    d2 = jnp.where(s[:, :N] > _BIG / 2, _BIG, d2)
    idx = idx[:, :N]
    return _finalize(d2, idx, coord, coord, mask, exact_dist)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "window", "probes", "exact_dist")
)
def knn_cross_spatial(
    query_coord: jnp.ndarray,  # (B, Nq, 3)
    key_coord: jnp.ndarray,  # (B, Nk, 3)
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    tile_q: int = 256,
    window: int = 1024,
    probes: int = 3,
    exact_dist: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approximate cross-cloud kNN with the knn.knn return contract."""
    B, Nq, _ = query_coord.shape
    Nk = key_coord.shape[1]
    if query_mask is None:
        query_mask = jnp.ones((B, Nq), bool)
    if key_mask is None:
        key_mask = jnp.ones((B, Nk), bool)
    query_coord = lax.stop_gradient(query_coord.astype(jnp.float32))
    key_coord = lax.stop_gradient(key_coord.astype(jnp.float32))
    tile_q = min(tile_q, Nq)
    window = max(min(window, Nk), min(tile_q, Nk))
    d2, idx = _multi_probe(
        query_coord, key_coord, query_mask, key_mask, k, tile_q, window,
        probes, self_mode=False,
    )
    return _finalize(d2, idx, query_coord, key_coord, query_mask, exact_dist)
