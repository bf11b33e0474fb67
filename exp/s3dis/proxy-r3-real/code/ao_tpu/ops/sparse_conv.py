"""Sparse (submanifold) convolution primitives on fixed-shape voxel sets.

TPU-native replacement for the reference's spconv dependency
(reference: pointcept/models/sparse_unet/spconv_unet_v1m1_base.py uses
SubMConv3d / SparseConv3d / SparseInverseConv3d). Instead of GPU hash
tables + gather/scatter rulebooks, voxel sets are dense padded arrays of
integer coordinates with validity masks:

* a per-scene "hash table" is the array of linearised voxel keys sorted
  ascending; neighbour lookup = ``searchsorted`` + equality check (exact,
  jit-friendly, O(log M) per probe on sorted data);
* submanifold convolution gathers the (M, K) neighbour features and
  contracts against a (K, C_in, C_out) kernel in one einsum — an implicit
  GEMM that rides the MXU;
* stride-2 downsampling derives output sites as the unique fine//2
  coordinates (capacity-bounded, like ops.grid_pool) and k=2 convolution
  reads the 2^3 block members;
* the k=2 inverse convolution routes each fine site's parent feature
  through the kernel slot given by its position inside the parent block —
  the same indice-pair structure spconv caches via ``indice_key``.
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INT_MAX = np.int32(np.iinfo(np.int32).max)


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """(K, 3) integer offsets centred for odd kernels, [0, k) for even."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(kernel_size)
    return np.array(list(itertools.product(r, r, r)), np.int32)


def _linearize(dc: jnp.ndarray, extent: jnp.ndarray) -> jnp.ndarray:
    """dc (B, M, 3) int32 -> linear keys (B, M); caller guarantees
    0 <= dc < extent (checked with a validity mask)."""
    return (dc[..., 0] * extent[:, None, 1] + dc[..., 1]) * extent[:, None, 2] + dc[..., 2]


def build_table(dc: jnp.ndarray, mask: jnp.ndarray):
    """Sorted voxel-key table for lookups.

    Returns (keys_sorted (B, M), order (B, M), extent (B, 3)). Padding
    voxels sort last with key INT_MAX.
    """
    dcc = jnp.where(mask[..., None], dc, 0)
    extent = jnp.max(dcc, axis=1) + 1  # (B, 3)
    keys = _linearize(dcc, extent)
    keys = jnp.where(mask, keys, _INT_MAX)
    order = jnp.argsort(keys, axis=1)
    return jnp.take_along_axis(keys, order, axis=1), order, extent


def lookup(
    keys_sorted: jnp.ndarray,  # (B, M)
    order: jnp.ndarray,  # (B, M)
    query_dc: jnp.ndarray,  # (B, Q, 3) int32 (may be out of range)
    extent: jnp.ndarray,  # (B, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find each query coordinate in the table. Returns (idx (B, Q) into the
    ORIGINAL voxel order, found (B, Q))."""
    in_range = jnp.all((query_dc >= 0) & (query_dc < extent[:, None, :]), axis=-1)
    q = _linearize(jnp.where(in_range[..., None], query_dc, 0), extent)
    q = jnp.where(in_range, q, _INT_MAX - 1)
    pos = jax.vmap(jnp.searchsorted)(keys_sorted, q)
    pos = jnp.minimum(pos, keys_sorted.shape[1] - 1)
    found = (jnp.take_along_axis(keys_sorted, pos, axis=1) == q) & in_range
    idx = jnp.take_along_axis(order, pos, axis=1)
    return jnp.where(found, idx, 0).astype(jnp.int32), found


def neighbor_idx(
    table,  # (keys_sorted, order, extent) of the INPUT voxel set
    in_dc: jnp.ndarray,
    out_dc: jnp.ndarray,  # (B, Mo, 3) output sites (input coords / stride)
    out_mask: jnp.ndarray,
    offsets: np.ndarray,  # (K, 3)
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, Mo, K) input indices + validity for each output site x offset."""
    keys_sorted, order, extent = table
    B, Mo, _ = out_dc.shape
    K = offsets.shape[0]
    probe = out_dc[:, :, None, :] * stride + offsets[None, None, :, :]
    idx, found = lookup(
        keys_sorted, order, probe.reshape(B, Mo * K, 3), extent
    )
    idx = idx.reshape(B, Mo, K)
    found = found.reshape(B, Mo, K) & out_mask[:, :, None]
    return idx, found


def sparse_conv_apply(
    feat: jnp.ndarray,  # (B, M, C_in) input voxel features
    idx: jnp.ndarray,  # (B, Mo, K)
    valid: jnp.ndarray,  # (B, Mo, K)
    kernel: jnp.ndarray,  # (K, C_in, C_out)
) -> jnp.ndarray:
    """Implicit-GEMM sparse convolution: gather + single einsum."""
    gathered = jnp.take_along_axis(
        feat[:, :, None, :], idx[:, :, :, None], axis=1
    )  # (B, Mo, K, C_in)
    gathered = jnp.where(valid[..., None], gathered, 0.0)
    return jnp.einsum("bmkc,kcd->bmd", gathered, kernel)


@functools.partial(jax.jit, static_argnames=("max_out",))
def sparse_downsample(
    dc: jnp.ndarray,  # (B, M, 3) int32
    mask: jnp.ndarray,  # (B, M)
    max_out: int,
):
    """Stride-2 site derivation: unique(dc // 2), capacity-bounded.

    Returns (out_dc (B, Mo, 3), out_mask (B, Mo), parent (B, M) int32 map
    from each fine site to its coarse row)."""
    B, M, _ = dc.shape
    coarse = jnp.where(mask[..., None], dc // 2, 0)
    extent = jnp.max(coarse, axis=1) + 1
    key = _linearize(coarse, extent)
    key = jnp.where(mask, key, _INT_MAX)
    order = jnp.argsort(key, axis=1)
    key_sorted = jnp.take_along_axis(key, order, axis=1)
    mask_sorted = jnp.take_along_axis(mask, order, axis=1)
    new = jnp.concatenate(
        [
            jnp.ones((B, 1), bool),
            key_sorted[:, 1:] != key_sorted[:, :-1],
        ],
        axis=1,
    ) & mask_sorted
    cid_sorted = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    inv = jnp.argsort(order, axis=1)
    parent = jnp.take_along_axis(cid_sorted, inv, axis=1)
    parent = jnp.minimum(parent, max_out - 1)
    parent = jnp.where(mask, parent, max_out - 1)

    seg = jnp.where(mask_sorted, jnp.minimum(cid_sorted, max_out - 1), max_out)
    coarse_sorted = jnp.take_along_axis(coarse, order[..., None], axis=1)

    def seg_first(cs, sg):
        # first (== any, they're identical) coarse coord per cluster
        return jax.ops.segment_min(
            jnp.where(sg[:, None] < max_out, cs, _INT_MAX),
            jnp.minimum(sg, max_out),
            num_segments=max_out + 1,
        )[:max_out]

    out_dc = jax.vmap(seg_first)(coarse_sorted, seg)
    counts = jax.vmap(
        lambda sg: jax.ops.segment_sum(
            jnp.where(sg < max_out, 1, 0), jnp.minimum(sg, max_out),
            num_segments=max_out + 1,
        )[:max_out]
    )(seg)
    out_mask = counts > 0
    out_dc = jnp.where(out_mask[..., None], out_dc, 0).astype(jnp.int32)
    return out_dc, out_mask, parent
