"""Partition-based (grid) pooling with fixed shapes.

TPU-native equivalent of the reference GridPool's
``voxel_grid -> unique -> segment_csr`` chain
(reference: pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py:229-269,
which leans on torch_geometric.voxel_grid and torch_scatter.segment_csr).

Dynamic-size ``unique`` does not exist under jit, so the design is:
sort points by voxel key, mark key changes, prefix-sum to get contiguous
cluster ids, and reduce with ``jax.ops.segment_{sum,max}`` into a
*static-capacity* cluster buffer of ``max_clusters`` rows with a validity
mask. Cluster ids follow ascending voxel-key order, matching the
reference's ``torch.unique(sorted=True)`` ordering. The per-point cluster
map is returned for 'map'-backend unpooling.

Voxel keys are linearised with per-scene dynamic extents (traced values) in
int32; scenes with more than ~2^31 occupied-extent cells would overflow —
far beyond any dataset in the reference (S3DIS/ScanNet rooms, 50m KITTI
clips at >=0.05m grids).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid_pool_single(coord, feat, mask, grid_size, max_clusters):
    N = coord.shape[0]
    big = np.float32(1e30)  # numpy: eager jnp constants stall nested-jit lowering
    # Per-scene min over valid points (reference: segment_csr(coord, reduce="min")).
    start = jnp.min(jnp.where(mask[:, None], coord, big), axis=0)  # (3,)
    d = jnp.floor((coord - start[None, :]) / grid_size).astype(jnp.int32)  # (N, 3)
    d = jnp.where(mask[:, None], d, 0)
    extent = jnp.max(d, axis=0) + 1  # (3,) traced ints
    key = (d[:, 0] * extent[1] + d[:, 1]) * extent[2] + d[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)  # padding sorts last

    order = jnp.argsort(key)  # stable
    key_sorted = key[order]
    mask_sorted = mask[order]
    new_cluster = jnp.concatenate(
        [jnp.asarray(np.ones((1,), bool)), key_sorted[1:] != key_sorted[:-1]]
    )
    new_cluster = new_cluster & mask_sorted
    cid_sorted = jnp.cumsum(new_cluster.astype(jnp.int32)) - 1  # (N,)
    n_clusters = jnp.max(jnp.where(mask_sorted, cid_sorted, -1)) + 1
    # Scatter cluster ids back to original point order.
    cluster = jnp.asarray(np.zeros((N,), np.int32)).at[order].set(cid_sorted)
    # Overflow beyond the static cap attaches to the last cluster (rare; the
    # cap should be sized per stage) — still in-range for unpool gathers.
    cluster = jnp.minimum(cluster, max_clusters - 1)
    cluster = jnp.where(mask, cluster, max_clusters - 1)

    seg_ids = jnp.where(mask, cluster, max_clusters)  # invalid -> dropped bucket
    counts = jax.ops.segment_sum(
        jnp.where(mask, np.float32(1), np.float32(0)), seg_ids, num_segments=max_clusters + 1
    )[:max_clusters]
    coord_sum = jax.ops.segment_sum(
        jnp.where(mask[:, None], coord, 0.0), seg_ids, num_segments=max_clusters + 1
    )[:max_clusters]
    pooled_coord = coord_sum / jnp.maximum(counts[:, None], 1.0)
    feat_masked = jnp.where(mask[:, None], feat, -big)
    pooled_feat = jax.ops.segment_max(
        feat_masked, seg_ids, num_segments=max_clusters + 1
    )[:max_clusters]
    pooled_mask = counts > 0
    pooled_feat = jnp.where(pooled_mask[:, None], pooled_feat, 0.0)
    pooled_coord = jnp.where(pooled_mask[:, None], pooled_coord, 0.0)
    return pooled_coord, pooled_feat, pooled_mask, cluster, n_clusters


@functools.partial(jax.jit, static_argnames=("max_clusters",))
def grid_pool(
    coord: jnp.ndarray,  # (B, N, 3)
    feat: jnp.ndarray,  # (B, N, C)
    mask: jnp.ndarray,  # (B, N) bool
    grid_size,
    max_clusters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pooled_coord (B,M,3), pooled_feat (B,M,C) max-reduced,
    pooled_mask (B,M), cluster (B,N) int32 map into M, n_clusters (B,))."""
    return jax.vmap(
        lambda c, f, m: _grid_pool_single(c, f, m, grid_size, max_clusters)
    )(coord, feat, mask)


def unpool_map(pooled_feat: jnp.ndarray, cluster: jnp.ndarray,
               point_mask: jnp.ndarray) -> jnp.ndarray:
    """'map' backend unpooling: broadcast each cluster's feature back to its
    member points (reference: UnpoolWithSkip backend 'map', :305-311)."""
    up = jnp.take_along_axis(pooled_feat, cluster[:, :, None], axis=1)
    return jnp.where(point_mask[:, :, None], up, 0.0)
