"""Radius-bounded neighbour search (ball query).

TPU-native equivalent of the reference's CUDA ball query
(reference: libs/pointops/src/ball_query/ball_query_cuda_kernel.cu and
functions/query.py:73-108): for each query, find up to ``nsample``
neighbours with min_radius <= dist < max_radius; pad by repeating the first
found neighbour (the reference's padding convention). Built on the same
tiled top-k machinery as kNN — the nsample nearest within the annulus are
selected, which matches the reference's scan order only up to permutation
but is deterministic and distance-sorted.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .knn import knn


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    query_coord: jnp.ndarray,  # (B, M, 3)
    key_coord: jnp.ndarray,  # (B, N, 3)
    nsample: int,
    min_radius: float = 0.0,
    max_radius: float = 1.0,
    query_mask: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    idx, dist, valid = knn(query_coord, key_coord, nsample, query_mask, key_mask)
    in_ball = valid & (dist >= min_radius) & (dist < max_radius)
    # Pad by repeating the first in-ball neighbour.
    has_any = jnp.any(in_ball, axis=-1)
    first_pos = jnp.argmax(in_ball, axis=-1)  # first True (0 if none)
    first_idx = jnp.take_along_axis(idx, first_pos[..., None], axis=-1)
    first_dist = jnp.take_along_axis(dist, first_pos[..., None], axis=-1)
    idx = jnp.where(in_ball, idx, first_idx)
    dist = jnp.where(in_ball, dist, first_dist)
    valid_out = in_ball | (has_any[..., None] & jnp.ones_like(in_ball))
    valid_out = has_any[..., None] & valid_out
    return idx, dist, valid_out
