"""Shared model building blocks.

``PointBatchNorm`` replicates the reference's BatchNorm1d-over-points
(reference: point_transformer_v2m2_base.py:26-45) for *padded* batches:
statistics are computed only over valid elements (the reference has no
padding — its ragged batches contain real points only — so masked
statistics are the parity-preserving translation). Under pjit the
batch axis is globally sharded and XLA computes the masked means with
cross-chip collectives, which subsumes the reference's SyncBatchNorm
(train.py:204-205) with no extra code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PointBatchNorm(nn.Module):
    """Masked batch normalisation over all leading axes.

    Input ``x``: (..., C). ``mask``: boolean, shape = x.shape[:-1] (or
    broadcastable); None means all valid. Running statistics live in the
    ``batch_stats`` collection (torch momentum 0.1 semantics; unbiased
    running var like torch BatchNorm1d).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 use_running_average: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = float(np.prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)[..., None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=reduce_axes) / n
                var = jnp.sum(((xf - mean) ** 2) * m, axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference uses timm DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        # one decision per batch element
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
