"""Farthest point sampling (FPS).

TPU-native equivalent of the reference's shared-memory argmax FPS kernel
(reference: libs/pointops/src/sampling/sampling_cuda_kernel.cu:15-129).
FPS is inherently sequential in the number of samples m; the idiomatic TPU
form is a ``lax.fori_loop`` whose body does one fused distance update +
masked argmax over the running min-distance array — each iteration is a
single VPU sweep over N points, with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fps_single(coord, mask, m, start_idx):
    N = coord.shape[0]
    neg = np.float32(-1e30)  # numpy: eager jnp constants stall nested-jit lowering

    def body(i, state):
        min_d2, selected = state
        last = selected[i - 1]
        diff = coord - coord[last][None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        scores = jnp.where(mask, min_d2, neg)
        nxt = jnp.argmax(scores).astype(jnp.int32)
        return min_d2, selected.at[i].set(nxt)

    selected = jnp.asarray(np.zeros((m,), np.int32)).at[0].set(start_idx)
    init_d2 = jnp.asarray(np.full((N,), 1e30, np.float32))
    _, selected = lax.fori_loop(1, m, body, (init_d2, selected))
    # Validity: the i-th sample is meaningful only while i < n_valid.
    n_valid = jnp.sum(mask.astype(jnp.int32))
    valid = np.arange(m) < n_valid
    return jnp.where(valid, selected, 0), valid


@functools.partial(jax.jit, static_argnames=("m",))
def farthest_point_sampling(
    coord: jnp.ndarray,  # (B, N, 3)
    mask: Optional[jnp.ndarray],  # (B, N) bool or None
    m: int,
    start_idx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (idx (B, m) int32, valid (B, m) bool). The first sample is
    ``start_idx`` (the reference seeds with the segment's first point)."""
    B, N, _ = coord.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    coord = lax.stop_gradient(coord.astype(jnp.float32))
    start = jnp.asarray(np.full((B,), start_idx, np.int32))
    return jax.vmap(lambda c, mk, s: _fps_single(c, mk, m, s))(coord, mask, start)
