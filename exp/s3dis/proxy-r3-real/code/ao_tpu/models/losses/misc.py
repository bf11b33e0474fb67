"""Segmentation losses (reference: pointcept/models/losses/misc.py:15-223).

All losses take ``(pred, target, mask)`` where pred is (..., C) logits,
target (...) int labels, and mask an optional validity mask (padded points);
``ignore_index`` targets are additionally excluded, mirroring the reference.
Reductions are means over contributing elements.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .builder import LOSSES


def _valid_mask(target, mask, ignore_index):
    v = target != ignore_index
    if mask is not None:
        v = v & mask
    return v


def _mean(x, v):
    return jnp.sum(jnp.where(v, x, 0.0)) / jnp.maximum(jnp.sum(v), 1.0)


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        size_average=None,
        reduce=None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = None if weight is None else np.asarray(weight, np.float32)
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, pred, target, mask=None):
        C = pred.shape[-1]
        v = _valid_mask(target, mask, self.ignore_index)
        t = jnp.where(v, target, 0)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(t, C)
        if self.label_smoothing > 0:
            onehot = (
                onehot * (1.0 - self.label_smoothing) + self.label_smoothing / C
            )
        nll = -jnp.sum(onehot * logp, axis=-1)
        if self.weight is not None:
            w = self.weight[t]
            # torch weighted CE: sum(w*l)/sum(w) over valid targets
            return (
                self.loss_weight
                * jnp.sum(jnp.where(v, w * nll, 0.0))
                / jnp.maximum(jnp.sum(jnp.where(v, w, 0.0)), 1e-12)
            )
        return self.loss_weight * _mean(nll, v)


@LOSSES.register_module()
class SmoothCELoss:
    """Smoothed CE (reference: losses/misc.py SmoothCELoss)."""

    def __init__(self, smoothing_ratio: float = 0.1, ignore_index: int = -1,
                 loss_weight: float = 1.0):
        self.eps = smoothing_ratio
        self.ignore_index = ignore_index
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None):
        C = pred.shape[-1]
        v = _valid_mask(target, mask, self.ignore_index)
        t = jnp.where(v, target, 0)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(t, C) * (1 - self.eps) + self.eps / C
        loss = -jnp.sum(onehot * logp, axis=-1)
        return self.loss_weight * _mean(loss, v)


@LOSSES.register_module()
class BinaryFocalLoss:
    def __init__(self, gamma: float = 2.0, alpha: float = 0.5, logits: bool = True,
                 reduce: bool = True, loss_weight: float = 1.0):
        self.gamma, self.alpha = gamma, alpha
        self.logits, self.reduce = logits, reduce
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None):
        """pred: (N,) logits; target: (N,) in {0,1}."""
        pred = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if self.logits:
            p = jax.nn.sigmoid(pred)
            bce = jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        else:
            p = pred
            bce = -(t * jnp.log(p + 1e-12) + (1 - t) * jnp.log(1 - p + 1e-12))
        pt = p * t + (1 - p) * (1 - t)
        at = self.alpha * t + (1 - self.alpha) * (1 - t)
        focal = at * (1 - pt) ** self.gamma * bce
        v = jnp.ones_like(t, bool) if mask is None else mask
        if self.reduce:
            return self.loss_weight * _mean(focal, v)
        return self.loss_weight * jnp.where(v, focal, 0.0)


@LOSSES.register_module()
class FocalLoss:
    """Multi-class focal loss (reference: losses/misc.py FocalLoss)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.5,
                 reduction: str = "mean", loss_weight: float = 1.0,
                 ignore_index: int = -1):
        self.gamma, self.alpha = gamma, alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None):
        C = pred.shape[-1]
        v = _valid_mask(target, mask, self.ignore_index)
        t = jnp.where(v, target, 0)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        p = jnp.exp(logp)
        onehot = jax.nn.one_hot(t, C)
        pt = jnp.sum(p * onehot, axis=-1)
        logpt = jnp.sum(logp * onehot, axis=-1)
        alpha_t = self.alpha  # scalar alpha as in the reference default
        focal = -alpha_t * (1 - pt) ** self.gamma * logpt
        if self.reduction == "mean":
            return self.loss_weight * _mean(focal, v)
        return self.loss_weight * jnp.sum(jnp.where(v, focal, 0.0))


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, smooth: float = 1.0, exponent: float = 2.0,
                 loss_weight: float = 1.0, ignore_index: int = -1):
        self.smooth, self.exponent = smooth, exponent
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None):
        C = pred.shape[-1]
        v = _valid_mask(target, mask, self.ignore_index)
        t = jnp.where(v, target, 0)
        p = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        p = p * v[..., None]
        onehot = jax.nn.one_hot(t, C) * v[..., None]
        p = p.reshape(-1, C)
        onehot = onehot.reshape(-1, C)
        num = 2.0 * jnp.sum(p * onehot, axis=0) + self.smooth
        den = (
            jnp.sum(p**self.exponent, axis=0)
            + jnp.sum(onehot**self.exponent, axis=0)
            + self.smooth
        )
        dice = 1.0 - num / den
        return self.loss_weight * jnp.mean(dice)
