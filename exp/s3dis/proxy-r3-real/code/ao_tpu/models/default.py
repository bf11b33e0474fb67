"""Task wrapper modules (reference: pointcept/models/default.py:232-290).

The reference wrappers branch on ``self.training`` / key presence and
return loss or logits; in the functional engine the train/eval/test split
lives in the jitted step functions, so these wrappers only define the
forward computation. ``build_model`` constructs nested backbones from
config before instantiating the wrapper (linen adopts module instances
passed as attributes).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS
from .utils import PointBatchNorm


def _accepts_category(module) -> bool:
    import inspect

    try:
        return "category" in inspect.signature(type(module).__call__).parameters
    except (TypeError, ValueError):
        return False


@MODELS.register_module()
class DefaultSegmentor(nn.Module):
    backbone: Any = None

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False, category=None):
        if category is not None and _accepts_category(self.backbone):
            # part-seg backbones condition on the shape class
            return self.backbone(
                coord, feat, mask, deterministic, use_running_average,
                category=category,
            )
        return self.backbone(coord, feat, mask, deterministic, use_running_average)


@MODELS.register_module()
class DefaultClassifier(nn.Module):
    """Backbone features -> masked global pool -> MLP classifier head.

    The reference feeds a backbone-global embedding to
    Linear-BN-ReLU-Dropout x2 -> Linear (default.py:268-278); per-point
    backbones are pooled with a masked mean+max here.
    """

    backbone: Any = None
    num_classes: int = 40
    backbone_embed_dim: int = 256

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        h = self.backbone(coord, feat, mask, deterministic, use_running_average)
        if h.ndim == 3:  # (B, N, C) per-point features -> global pool
            m = mask[..., None].astype(h.dtype)
            mean = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
            mx = jnp.max(jnp.where(mask[..., None], h, -jnp.inf), axis=1)
            h = jnp.concatenate([mean, mx], axis=-1)
        ura = use_running_average
        h = nn.Dense(256)(h)
        h = PointBatchNorm(256)(h, None, ura)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        h = nn.Dense(128)(h)
        h = PointBatchNorm(128)(h, None, ura)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        return nn.Dense(self.num_classes)(h)
