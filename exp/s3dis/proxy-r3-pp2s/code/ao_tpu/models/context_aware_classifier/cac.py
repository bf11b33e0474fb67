"""Context-Aware Classifier segmentor (CAC).

TPU-native re-implementation of the reference CAC-v1m1
(reference: pointcept/models/context_aware_classifier/
context_aware_classifier_v1m1_base.py:15-270): the seg head's weight rows
act as class prototypes; per scene, prediction-weighted feature prototypes
refine the logits through a projection + cosine classifier, a GT-prototype
"adaptive perspective" branch supervises training, and an entropy-weighted
distillation loss ties the branches. Per-scene loops become masked batched
einsums.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ao_tpu.models.builder import MODELS


def _normalize(x, axis=-1):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def _mlp2(name, width_in, width_out):
    class _M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(width_in, use_bias=False)(x)
            h = nn.relu(h)
            return nn.Dense(width_out)(h)

    return _M(name=name)


@MODELS.register_module("CAC-v1m1")
class CACSegmentor(nn.Module):
    backbone: Any = None
    num_classes: int = 13
    backbone_out_channels: int = 96
    cos_temp: float = 15.0
    main_weight: float = 1.0
    pre_weight: float = 1.0
    pre_self_weight: float = 1.0
    kl_weight: float = 1.0
    conf_thresh: float = 0.0
    detach_pre_logits: bool = False

    def setup(self):
        C = self.backbone_out_channels
        # explicit weight/bias so the class-prototype rows are addressable
        # (the reference reads self.seg_head.weight as the prototype bank)
        self.seg_weight = self.param(
            "seg_head_weight", nn.initializers.lecun_normal(),
            (self.num_classes, C),
        )
        self.seg_bias = self.param(
            "seg_head_bias", nn.initializers.zeros, (self.num_classes,)
        )
        self.proj = _mlp2("proj", 2 * C, C)
        self.apd_proj = _mlp2("apd_proj", 2 * C, C)
        # feat_proj_layer: Dense -> BN -> ReLU -> Dense; BN over valid points
        self.feat_proj_in = nn.Dense(C, use_bias=False, name="feat_proj_in")
        self.feat_proj_out = nn.Dense(C, name="feat_proj_out")
        from ao_tpu.models.utils import PointBatchNorm

        self.feat_proj_bn = PointBatchNorm(C, name="feat_proj_bn")

    def _feat_proj(self, feat, mask, ura):
        h = self.feat_proj_in(feat)
        h = self.feat_proj_bn(h, mask, ura)
        return self.feat_proj_out(nn.relu(h))

    def _proto(self):
        return self.seg_weight

    def _cos_pred(self, x, proto):
        return jnp.einsum(
            "bnc,bkc->bnk", _normalize(x), _normalize(proto, axis=-1)
        )

    def post_refine(self, feat, pred, proto, mask, ura):
        """Prediction-weighted per-scene prototypes -> refined cosine pred
        (reference post_refine_proto_batch :99-150, batched)."""
        if self.detach_pre_logits:
            pred = jax.lax.stop_gradient(pred)
        w = jax.nn.softmax(pred, axis=-1)  # (B, N, K)
        if self.conf_thresh > 0:
            keep = jnp.max(w, axis=-1, keepdims=True) >= self.conf_thresh
            w = w * keep
        w = w * mask[..., None]
        denom = jnp.sum(w, axis=1)[..., None]  # (B, K, 1)
        pred_proto = jnp.einsum("bnk,bnc->bkc", w, feat) / (denom + 1e-7)
        pred_proto = jnp.concatenate(
            [pred_proto, jnp.broadcast_to(proto[None], pred_proto.shape)],
            axis=-1,
        )
        pred_proto = self.proj(pred_proto)
        x = self._feat_proj(feat, mask, ura)
        return self._cos_pred(x, pred_proto)

    def adaptive_perspective(self, feat, target, proto, mask, ura):
        """GT-class prototypes where present, learned prototypes elsewhere
        (reference get_adaptive_perspective :74-97, batched)."""
        K = self.num_classes
        onehot = jax.nn.one_hot(jnp.where(mask, target, -1), K)  # (B, N, K)
        cnt = jnp.sum(onehot, axis=1)  # (B, K)
        gt_proto = jnp.einsum("bnk,bnc->bkc", onehot, feat) / (
            cnt[..., None] + 1e-4
        )
        present = (cnt > 0)[..., None]
        base = jnp.broadcast_to(
            jax.lax.stop_gradient(proto)[None], gt_proto.shape
        )
        new_proto = jnp.where(present, gt_proto, base)
        new_proto = jnp.concatenate(
            [new_proto, jnp.broadcast_to(proto[None], new_proto.shape)], axis=-1
        )
        new_proto = self.apd_proj(new_proto)
        x = self._feat_proj(feat, mask, ura)
        return self._cos_pred(x, new_proto)

    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False, target=None):
        ura = use_running_average
        h = self.backbone(coord, feat, mask, deterministic, ura)
        seg_logits = h @ self.seg_weight.T + self.seg_bias
        proto = self._proto()
        refine_logits = (
            self.post_refine(h, seg_logits, proto, mask, ura) * self.cos_temp
        )
        if target is None:
            return dict(seg_logits=refine_logits, pre_logits=seg_logits)
        cac_pred = (
            self.adaptive_perspective(h, target, proto, mask, ura)
            * self.cos_temp
        )
        return dict(
            seg_logits=refine_logits, pre_logits=seg_logits, cac_pred=cac_pred
        )


def cac_distill_loss(pred, soft, target, mask, smoothness=0.5, eps=0.0):
    """Entropy-weighted class-balanced distillation
    (reference get_distill_loss :152-199), batched + masked."""
    K = pred.shape[-1]
    soft = jax.lax.stop_gradient(soft)
    valid = (target != -1) & mask
    t = jnp.where(valid, target, 0)
    sm = jax.nn.softmax(soft, axis=-1)
    onehot = jax.nn.one_hot(t, K) * valid[..., None]
    label = smoothness * sm + (1 - smoothness) * onehot
    if eps > 0:
        label = label * (1 - eps) + (1 - label) * eps / (K - 1)
    ce = -jnp.sum(jax.nn.log_softmax(pred, axis=-1) * label, axis=-1)
    entropy = -jnp.sum(sm * jnp.log(sm + 1e-4), axis=-1) * valid

    # class-wise entropy-normalised mean, averaged over present classes
    onehot_t = jax.nn.one_hot(t, K) * valid[..., None]  # (B, N, K)
    w = entropy[..., None] * onehot_t
    per_class = jnp.sum(ce[..., None] * w, axis=(0, 1)) / (
        jnp.sum(w, axis=(0, 1)) + 1e-4
    )
    present = jnp.sum(onehot_t, axis=(0, 1)) > 0
    return jnp.sum(jnp.where(present, per_class, 0.0)) / (
        jnp.sum(present) + 1e-4
    )
