"""Window packing for window-based point attention.

Dense fixed-shape equivalent of the reference stratified transformer's
window machinery (reference: pointcept/models/stratified_transformer/
stratified_transformer_v1m1_origin.py — pointops2 sparse edge-list
attention over per-window point sets). Points are bucketed into cubic
windows (optionally shifted by half a window), sorted by window id, and
scattered into a ``(num_windows_cap, points_per_window_cap)`` dense buffer
with validity masks — window attention then becomes plain batched dense
attention on the MXU. Points beyond a window's capacity are flagged so
the caller can bypass attention for them (residual passthrough); caps are
sized so this is rare.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INT_MAX = np.int32(np.iinfo(np.int32).max)


def window_ids(coord, mask, window_size: float, shift: bool = False):
    """Cubic window id per point (B, N) int32; invalid -> INT_MAX."""
    big = np.float32(1e30)
    lo = jnp.min(jnp.where(mask[..., None], coord, big), axis=1)  # (B, 3)
    c = coord - lo[:, None, :]
    if shift:
        c = c + window_size / 2
    d = jnp.floor(c / window_size).astype(jnp.int32)
    d = jnp.where(mask[..., None], d, 0)
    extent = jnp.max(d, axis=1) + 1
    wid = (d[..., 0] * extent[:, None, 1] + d[..., 1]) * extent[:, None, 2] + d[..., 2]
    return jnp.where(mask, wid, _INT_MAX)


@functools.partial(jax.jit, static_argnames=("num_windows", "capacity"))
def pack_windows(
    wid: jnp.ndarray,  # (B, N) window ids (INT_MAX = invalid)
    num_windows: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (point_idx (B, W, C) int32 rows into N, slot_valid (B, W, C),
    win_of_point (B, N) int32 window row or -1, slot_of_point (B, N)).

    Window rows follow ascending window-id order; windows beyond
    ``num_windows`` and points beyond ``capacity`` are dropped (their
    win_of_point = -1)."""
    B, N = wid.shape
    order = jnp.argsort(wid, axis=1)
    wid_sorted = jnp.take_along_axis(wid, order, axis=1)
    valid_sorted = wid_sorted != _INT_MAX
    new_w = jnp.concatenate(
        [jnp.ones((B, 1), bool), wid_sorted[:, 1:] != wid_sorted[:, :-1]], axis=1
    ) & valid_sorted
    wrow_sorted = jnp.cumsum(new_w.astype(jnp.int32), axis=1) - 1  # (B, N)
    # position within window = index - window start
    idx_in_seq = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    seg_start = jnp.where(new_w, idx_in_seq, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start, axis=1)
    slot_sorted = idx_in_seq - seg_start

    keep = (
        valid_sorted
        & (wrow_sorted < num_windows)
        & (slot_sorted < capacity)
    )
    flat = jnp.where(
        keep, wrow_sorted * capacity + slot_sorted, num_windows * capacity
    )
    point_rows = order.astype(jnp.int32)

    def scatter_one(flat_b, rows_b):
        buf = jnp.full((num_windows * capacity + 1,), -1, jnp.int32)
        buf = buf.at[flat_b].set(rows_b)
        return buf[:-1].reshape(num_windows, capacity)

    point_idx = jax.vmap(scatter_one)(flat, point_rows)
    slot_valid = point_idx >= 0
    point_idx = jnp.where(slot_valid, point_idx, 0)

    # inverse maps in original point order
    inv = jnp.argsort(order, axis=1)
    win_of_point = jnp.take_along_axis(
        jnp.where(keep, wrow_sorted, -1), inv, axis=1
    )
    slot_of_point = jnp.take_along_axis(
        jnp.where(keep, slot_sorted, 0), inv, axis=1
    )
    return point_idx, slot_valid, win_of_point.astype(jnp.int32), \
        slot_of_point.astype(jnp.int32)
