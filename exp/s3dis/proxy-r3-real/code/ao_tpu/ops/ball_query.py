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


@functools.partial(
    jax.jit, static_argnames=("nsample", "candidate_factor")
)
def random_ball_query(
    query_coord: jnp.ndarray,
    key_coord: jnp.ndarray,
    nsample: int,
    min_radius: float = 0.0,
    max_radius: float = 1.0,
    query_mask=None,
    key_mask=None,
    rng=None,
    candidate_factor: int = 4,
):
    """Random sample of in-ball neighbours (reference:
    libs/pointops/functions/query.py:27-70 — the CUDA kernel scans a
    host-shuffled key order, yielding a random in-ball subset rather than
    the nearest ones). Here: gather ``candidate_factor * nsample`` nearest
    candidates, then keep a uniformly random nsample of those inside the
    annulus."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    kk = nsample * candidate_factor
    idx, dist, valid = knn(
        query_coord, key_coord, kk, query_mask, key_mask
    )
    in_ball = valid & (dist >= min_radius) & (dist < max_radius)
    score = jnp.where(
        in_ball, jax.random.uniform(rng, in_ball.shape), -1.0
    )
    _, pick = jax.lax.top_k(score, nsample)  # random nsample of the in-ball
    sel_idx = jnp.take_along_axis(idx, pick, axis=-1)
    sel_dist = jnp.take_along_axis(dist, pick, axis=-1)
    sel_valid = jnp.take_along_axis(in_ball, pick, axis=-1)
    # pad by repeating the first valid pick (the reference convention)
    has_any = jnp.any(sel_valid, axis=-1)
    first_pos = jnp.argmax(sel_valid, axis=-1)
    first_idx = jnp.take_along_axis(sel_idx, first_pos[..., None], axis=-1)
    first_dist = jnp.take_along_axis(sel_dist, first_pos[..., None], axis=-1)
    sel_idx = jnp.where(sel_valid, sel_idx, first_idx)
    sel_dist = jnp.where(sel_valid, sel_dist, first_dist)
    return sel_idx, sel_dist, has_any[..., None] & jnp.ones_like(sel_valid)
