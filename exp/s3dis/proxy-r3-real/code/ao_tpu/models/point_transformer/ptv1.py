"""Point Transformer V1 (seg + cls).

TPU-native re-implementation of the reference PT-v1
(reference: pointcept/models/point_transformer/point_transformer_seg.py and
point_transformer_cls.py): subtraction-relation vector attention
(PointTransformerLayer :19-78), FPS+kNN strided downsampling
(TransitionDown :81-120), interpolation/global-context upsampling
(TransitionUp :123-166), Bottleneck residual blocks, and the
26/38/50-layer U-Nets. Padded ``(B, N, ...)`` batches with masks replace
offset packing; FPS/kNN/interpolation come from ao_tpu.ops.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm
from ao_tpu.ops import (
    farthest_point_sampling,
    grouping,
    grouping_with_rel_coord,
    interpolation,
    knn,
    knn_query,
)


class LayerNorm1d(nn.Module):
    """LayerNorm over the channel axis (reference utils.LayerNorm1d)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)


class PointTransformerLayer(nn.Module):
    in_planes: int
    out_planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, mask, use_running_average=False):
        mid = self.out_planes
        q = nn.Dense(mid)(feat)
        k = nn.Dense(mid)(feat)
        v = nn.Dense(self.out_planes)(feat)
        idx, _, valid = knn_query(self.nsample, coord, mask)
        k_g = grouping(k, idx, valid)  # (B, N, ns, mid)
        v_g = grouping(v, idx, valid)
        p_r = grouping_with_rel_coord(coord, coord, idx, valid)

        # linear_p: Linear(3,3) -> LN -> ReLU -> Linear(3, out)
        pe = nn.Dense(3)(p_r)
        pe = nn.LayerNorm()(pe)
        pe = nn.relu(pe)
        pe = nn.Dense(self.out_planes)(pe)

        # r_qk = k - q + sum over the (out/mid) position-encoding groups
        B, N, ns, _ = k_g.shape
        pe_sum = pe.reshape(B, N, ns, -1, mid).sum(axis=3)
        r_qk = k_g - q[:, :, None, :] + pe_sum

        # linear_w: LN -> ReLU -> Linear(mid, out/share) -> LN -> ReLU -> Linear
        w = nn.LayerNorm()(r_qk)
        w = nn.relu(w)
        w = nn.Dense(self.out_planes // self.share_planes)(w)
        w = nn.LayerNorm()(w)
        w = nn.relu(w)
        w = nn.Dense(self.out_planes // self.share_planes)(w)
        w = jnp.where(valid[..., None], w, -jnp.inf)
        w = nn.softmax(w, axis=2)
        w = jnp.where(valid[..., None], w, 0.0)

        s = self.share_planes
        vpe = (v_g + pe).reshape(B, N, ns, s, self.out_planes // s)
        out = jnp.einsum("bntsi,bnti->bnsi", vpe, w).reshape(B, N, self.out_planes)
        return jnp.where(mask[:, :, None], out, 0.0)


class TransitionDown(nn.Module):
    in_planes: int
    out_planes: int
    stride: int = 1
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, mask, use_running_average=False):
        ura = use_running_average
        if self.stride == 1:
            h = nn.Dense(self.out_planes, use_bias=False)(feat)
            h = PointBatchNorm(self.out_planes)(h, mask, ura)
            return coord, nn.relu(h), mask
        B, N, _ = coord.shape
        m = N // self.stride
        sel, _ = farthest_point_sampling(coord, mask, m)
        new_coord = jnp.take_along_axis(coord, sel[:, :, None], axis=1)
        # valid sample count per scene = n_valid // stride (reference n_o)
        n_valid = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
        new_mask = (
            jnp.arange(m)[None, :] < jnp.maximum(n_valid // self.stride, 1)
        )
        idx, _, valid = knn(
            new_coord, coord, self.nsample, new_mask, mask
        )
        grouped = grouping(feat, idx, valid)
        rel = grouping_with_rel_coord(coord, new_coord, idx, valid)
        h = jnp.concatenate([rel, grouped], axis=-1)  # (B, m, ns, 3+C)
        h = nn.Dense(self.out_planes, use_bias=False)(h)
        h = PointBatchNorm(self.out_planes)(h, valid, ura)
        h = nn.relu(h)
        h = jnp.max(jnp.where(valid[..., None], h, -jnp.inf), axis=2)
        h = jnp.where(new_mask[:, :, None], h, 0.0)
        return new_coord, h, new_mask


class TransitionUp(nn.Module):
    in_planes: int
    out_planes: int = 0  # 0 -> head (global context concat)
    num_shape_classes: int = 0  # >0 -> PartSeg: concat shape-class embedding
    shape_embed_dim: int = 1024

    @nn.compact
    def __call__(self, coord, feat, mask, skip_coord=None, skip_feat=None,
                 skip_mask=None, use_running_average=False, category=None):
        ura = use_running_average
        if self.out_planes == 0:
            mm = mask[..., None].astype(feat.dtype)
            cnt = jnp.maximum(mm.sum(axis=1), 1.0)
            gmean = (feat * mm).sum(axis=1) / cnt  # (B, C)
            g = nn.Dense(self.in_planes)(gmean)
            g = nn.relu(g)
            parts = [feat, jnp.broadcast_to(g[:, None, :], feat.shape)]
            if self.num_shape_classes:
                # PartSeg conditioning (reference:
                # point_transformer_partseg.py:143-178): one-hot shape
                # class -> Linear(1024) -> ReLU, broadcast to every point
                onehot = jax.nn.one_hot(
                    category.reshape(-1), self.num_shape_classes,
                    dtype=feat.dtype,
                )
                y = nn.relu(nn.Dense(self.shape_embed_dim)(onehot))
                parts.append(
                    jnp.broadcast_to(
                        y[:, None, :], feat.shape[:2] + (self.shape_embed_dim,)
                    )
                )
            h = jnp.concatenate(parts, axis=-1)
            h = nn.Dense(self.in_planes)(h)
            h = PointBatchNorm(self.in_planes)(h, mask, ura)
            return nn.relu(h)
        h1 = nn.Dense(self.out_planes)(skip_feat)
        h1 = PointBatchNorm(self.out_planes)(h1, skip_mask, ura)
        h1 = nn.relu(h1)
        h2 = nn.Dense(self.out_planes)(feat)
        h2 = PointBatchNorm(self.out_planes)(h2, mask, ura)
        h2 = nn.relu(h2)
        up = interpolation(coord, skip_coord, h2, mask, skip_mask)
        return jnp.where(skip_mask[:, :, None], h1 + up, 0.0)


class Bottleneck(nn.Module):
    planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, mask, use_running_average=False):
        ura = use_running_average
        identity = feat
        h = nn.Dense(self.planes, use_bias=False)(feat)
        h = nn.relu(PointBatchNorm(self.planes)(h, mask, ura))
        h = PointTransformerLayer(
            self.planes, self.planes, self.share_planes, self.nsample
        )(coord, h, mask, ura)
        h = nn.relu(PointBatchNorm(self.planes)(h, mask, ura))
        h = nn.Dense(self.planes, use_bias=False)(h)
        h = PointBatchNorm(self.planes)(h, mask, ura)
        h = nn.relu(identity + h)
        return jnp.where(mask[:, :, None], h, 0.0)


_PLANES = (32, 64, 128, 256, 512)
_STRIDE = (1, 4, 4, 4, 4)
_NSAMPLE = (8, 16, 16, 16, 16)


class PointTransformerSeg(nn.Module):
    blocks: Tuple[int, ...]
    in_channels: int = 6
    num_classes: int = 13
    share_planes: int = 8

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic=True,
                 use_running_average=False):
        ura = use_running_average
        # encoder
        skips = []
        in_planes = self.in_channels
        c, h, mk = coord, feat, mask
        for s in range(5):
            c, h, mk = TransitionDown(
                in_planes, _PLANES[s], _STRIDE[s], _NSAMPLE[s],
                name=f"enc{s+1}_down",
            )(c, h, mk, ura)
            for b in range(self.blocks[s]):
                h = Bottleneck(
                    _PLANES[s], self.share_planes, _NSAMPLE[s],
                    name=f"enc{s+1}_block{b}",
                )(c, h, mk, ura)
            in_planes = _PLANES[s]
            skips.append((c, h, mk))

        # decoder
        c, h, mk = skips[-1]
        h = TransitionUp(_PLANES[4], 0, name="dec5_up")(c, h, mk, None, None, None, ura)
        h = Bottleneck(_PLANES[4], self.share_planes, _NSAMPLE[4],
                       name="dec5_block0")(c, h, mk, ura)
        for s in reversed(range(4)):
            sc, sh, sm = skips[s]
            h = TransitionUp(_PLANES[s + 1], _PLANES[s], name=f"dec{s+1}_up")(
                c, h, mk, sc, sh, sm, ura
            )
            c, mk = sc, sm
            h = Bottleneck(
                _PLANES[s], self.share_planes, _NSAMPLE[s],
                name=f"dec{s+1}_block0",
            )(c, h, mk, ura)

        g = nn.Dense(_PLANES[0])(h)
        g = PointBatchNorm(_PLANES[0])(g, mk, ura)
        g = nn.relu(g)
        return nn.Dense(self.num_classes)(g)


class PointTransformerPartSeg(nn.Module):
    """PT-v1 part segmentation (reference:
    point_transformer_partseg.py:216-351): the Seg U-Net with the decoder
    head conditioned on the shape category via a one-hot -> Dense(1024)
    embedding concatenated into the innermost TransitionUp."""

    blocks: Tuple[int, ...]
    in_channels: int = 6
    num_classes: int = 50
    share_planes: int = 8
    num_shape_classes: int = 16

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic=True,
                 use_running_average=False, category=None):
        ura = use_running_average
        if category is None:
            category = jnp.zeros((coord.shape[0],), jnp.int32)
        skips = []
        in_planes = self.in_channels
        c, h, mk = coord, feat, mask
        for s in range(5):
            c, h, mk = TransitionDown(
                in_planes, _PLANES[s], _STRIDE[s], _NSAMPLE[s],
                name=f"enc{s+1}_down",
            )(c, h, mk, ura)
            for b in range(self.blocks[s]):
                h = Bottleneck(
                    _PLANES[s], self.share_planes, _NSAMPLE[s],
                    name=f"enc{s+1}_block{b}",
                )(c, h, mk, ura)
            in_planes = _PLANES[s]
            skips.append((c, h, mk))

        c, h, mk = skips[-1]
        h = TransitionUp(
            _PLANES[4], 0, num_shape_classes=self.num_shape_classes,
            name="dec5_up",
        )(c, h, mk, None, None, None, ura, category)
        h = Bottleneck(_PLANES[4], self.share_planes, _NSAMPLE[4],
                       name="dec5_block0")(c, h, mk, ura)
        for s in reversed(range(4)):
            sc, sh, sm = skips[s]
            h = TransitionUp(_PLANES[s + 1], _PLANES[s], name=f"dec{s+1}_up")(
                c, h, mk, sc, sh, sm, ura
            )
            c, mk = sc, sm
            h = Bottleneck(
                _PLANES[s], self.share_planes, _NSAMPLE[s],
                name=f"dec{s+1}_block0",
            )(c, h, mk, ura)

        g = nn.Dense(_PLANES[0])(h)
        g = PointBatchNorm(_PLANES[0])(g, mk, ura)
        g = nn.relu(g)
        return nn.Dense(self.num_classes)(g)


class PointTransformerCls(nn.Module):
    blocks: Tuple[int, ...]
    in_channels: int = 6
    num_classes: int = 40
    share_planes: int = 8

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic=True,
                 use_running_average=False):
        ura = use_running_average
        in_planes = self.in_channels
        c, h, mk = coord, feat, mask
        for s in range(5):
            c, h, mk = TransitionDown(
                in_planes, _PLANES[s], _STRIDE[s], _NSAMPLE[s],
                name=f"enc{s+1}_down",
            )(c, h, mk, ura)
            for b in range(self.blocks[s]):
                h = Bottleneck(
                    _PLANES[s], self.share_planes, _NSAMPLE[s],
                    name=f"enc{s+1}_block{b}",
                )(c, h, mk, ura)
            in_planes = _PLANES[s]
        mm = mk[..., None].astype(h.dtype)
        gmean = (h * mm).sum(axis=1) / jnp.maximum(mm.sum(axis=1), 1.0)
        g = nn.Dense(256)(gmean)
        g = PointBatchNorm(256)(g, None, ura)
        g = nn.relu(g)
        g = nn.Dropout(0.5)(g, deterministic=deterministic)
        g = nn.Dense(128)(g)
        g = PointBatchNorm(128)(g, None, ura)
        g = nn.relu(g)
        g = nn.Dropout(0.5)(g, deterministic=deterministic)
        return nn.Dense(self.num_classes)(g)


# flax dataclass modules can't be subclassed with __init__ overrides the
# torch way; register thin factories instead.
def _seg_factory(blocks):
    def make(**kwargs):
        return PointTransformerSeg(blocks=blocks, **kwargs)

    return make


def _cls_factory(blocks):
    def make(**kwargs):
        return PointTransformerCls(blocks=blocks, **kwargs)

    return make


MODELS.register_module(name="PointTransformer-Seg26",
                       module=_seg_factory((1, 1, 1, 1, 1)))
MODELS.register_module(name="PointTransformer-Seg38",
                       module=_seg_factory((1, 2, 2, 2, 2)))
MODELS.register_module(name="PointTransformer-Seg50",
                       module=_seg_factory((1, 2, 3, 5, 2)))
MODELS.register_module(name="PointTransformer-Cls26",
                       module=_cls_factory((1, 1, 1, 1, 1)))
MODELS.register_module(name="PointTransformer-Cls38",
                       module=_cls_factory((1, 2, 2, 2, 2)))
MODELS.register_module(name="PointTransformer-Cls50",
                       module=_cls_factory((1, 2, 3, 5, 2)))


def _partseg_factory(blocks):
    def make(**kwargs):
        return PointTransformerPartSeg(blocks=blocks, **kwargs)

    return make


MODELS.register_module(name="PointTransformer-PartSeg26",
                       module=_partseg_factory((1, 1, 1, 1, 1)))
MODELS.register_module(name="PointTransformer-PartSeg38",
                       module=_partseg_factory((1, 2, 2, 2, 2)))
MODELS.register_module(name="PointTransformer-PartSeg50",
                       module=_partseg_factory((1, 2, 3, 5, 2)))
