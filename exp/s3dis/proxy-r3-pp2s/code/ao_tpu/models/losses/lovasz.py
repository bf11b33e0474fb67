"""Lovász-Softmax loss (reference: pointcept/models/losses/lovasz.py:210-257).

jit-friendly formulation: all classes are processed with static shapes and
per-class "present" weighting replaces the reference's dynamic
``classes='present'`` filtering. Invalid/ignored points contribute zero
error and zero foreground, which leaves the Lovász extension value
unchanged (they sort last with error 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .builder import LOSSES


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t sorted errors (per class)."""
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
    )
    return jaccard


@LOSSES.register_module()
class LovaszLoss:
    def __init__(self, mode: str = "multiclass", loss_weight: float = 1.0,
                 ignore_index: int = -1, per_image: bool = False, **_):
        assert mode in ("multiclass", "binary")
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None):
        C = pred.shape[-1]
        pred = pred.reshape(-1, C).astype(jnp.float32)
        target = target.reshape(-1)
        v = target != self.ignore_index
        if mask is not None:
            v = v & mask.reshape(-1)
        probs = jax.nn.softmax(pred, axis=-1)
        t = jnp.where(v, target, 0)
        fg = (jax.nn.one_hot(t, C) * v[:, None]).T  # (C, N)
        errors = jnp.abs(fg - jnp.where(v[None, :], probs.T, 0.0))  # (C, N)
        errors_sorted, order = jax.lax.sort_key_val(
            -errors, jnp.broadcast_to(np.arange(fg.shape[1]), fg.shape), dimension=1
        )
        errors_sorted = -errors_sorted
        fg_sorted = jnp.take_along_axis(fg, order, axis=1)
        grad = _lovasz_grad(fg_sorted)
        per_class = jnp.sum(errors_sorted * grad, axis=1)  # (C,)
        present = jnp.sum(fg, axis=1) > 0
        loss = jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.maximum(
            jnp.sum(present), 1.0
        )
        return self.loss_weight * loss
