"""Inverse-distance-weighted k-NN interpolation.

TPU-native equivalent of the reference's interpolation kernel
(reference: libs/pointops/functions/interpolation.py:8-24 and
src/interpolation/interpolation_cuda_kernel.cu): find the k (=3) nearest
source points for every destination point, weight by 1/(dist + 1e-8)
normalised over the found neighbours, and blend features. Weights are
computed from stop-gradient distances (the reference kNN has no backward),
while feature gradients flow through the weighted gather.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .knn import knn
from .grouping import grouping

# above this many query*key pairs the exact tiled kNN's top_k merges
# dominate (hundreds of ms on a v5e); the curve-window search is ~30x
# cheaper at >99% recall for k=3. Profiling showed the exact path's scan
# +sort cost ~18ms even at ~9M pairs, so the budget sits low: exact only
# for genuinely tiny problems.
_EXACT_PAIR_BUDGET = 2_000_000


def interpolation(
    src_coord: jnp.ndarray,  # (B, N, 3) coarse coords
    dst_coord: jnp.ndarray,  # (B, M, 3) fine coords
    src_feat: jnp.ndarray,  # (B, N, C)
    src_mask: Optional[jnp.ndarray] = None,  # (B, N)
    dst_mask: Optional[jnp.ndarray] = None,  # (B, M)
    k: int = 3,
) -> jnp.ndarray:
    if src_coord.shape[1] * dst_coord.shape[1] > _EXACT_PAIR_BUDGET:
        from .knn_spatial import knn_cross_spatial

        idx, dist, valid = knn_cross_spatial(
            dst_coord, src_coord, k, dst_mask, src_mask,
            tile_q=512, window=512, probes=2,
        )
    else:
        idx, dist, valid = knn(dst_coord, src_coord, k, dst_mask, src_mask)
    w = jnp.where(valid, 1.0 / (dist + 1e-8), 0.0)  # (B, M, k)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    neigh = grouping(src_feat, idx, valid)  # (B, M, k, C)
    out = jnp.sum(neigh * w[..., None], axis=2)
    if dst_mask is not None:
        out = jnp.where(dst_mask[:, :, None], out, 0.0)
    return out
