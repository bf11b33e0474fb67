"""Neighbour gathering (reference: libs/pointops/functions/grouping.py:36-61).

The reference gathers ragged rows with a CUDA kernel and masks padded
neighbours by ``sign(idx + 1)``; here gathers are plain XLA
``take_along_axis`` over dense ``(B, N, ...)`` arrays with an explicit
validity mask, which XLA turns into efficient dynamic-gathers and fuses
with downstream elementwise work. Gradients flow through the gather
(scatter-add in the backward pass) exactly like the reference's
``grouping_backward_cuda``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def grouping(
    feat: jnp.ndarray,  # (B, N, C)
    idx: jnp.ndarray,  # (B, M, k) int32 into N
    valid: Optional[jnp.ndarray] = None,  # (B, M, k) bool
) -> jnp.ndarray:
    """Gather neighbour features -> (B, M, k, C); invalid slots are zeroed."""
    B, M, k = idx.shape
    gathered = jnp.take_along_axis(
        feat[:, :, None, :], idx[:, :, :, None], axis=1
    )  # (B, M, k, C)
    if valid is not None:
        gathered = jnp.where(valid[..., None], gathered, 0.0)
    return gathered


def grouping_with_rel_coord(
    coord: jnp.ndarray,  # (B, N, 3) key coordinates
    query_coord: jnp.ndarray,  # (B, M, 3)
    idx: jnp.ndarray,  # (B, M, k)
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Relative neighbour positions (B, M, k, 3), zeroed where invalid —
    the ``with_xyz=True`` path of the reference grouping."""
    grouped = jnp.take_along_axis(
        coord[:, :, None, :], idx[:, :, :, None], axis=1
    )
    rel = grouped - query_coord[:, :, None, :]
    if valid is not None:
        rel = jnp.where(valid[..., None], rel, 0.0)
    return rel
