"""SparseUNet (SpUNet) on TPU sparse-conv primitives.

Re-implementation of the reference SpUNet-v1m1/v1m2
(reference: pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:89-240
and spconv_unet_v1m2_bn_momentum.py), replacing spconv with the
searchsorted-hash implicit-GEMM sparse convs in ao_tpu.ops.sparse_conv.
The U-Net: stem SubMConv(k=5) -> 4x [SparseConv k2 s2 + BasicBlock^L] ->
4x [InverseConv k2 + skip concat + BasicBlock^L] -> 1x1 head. The inverse
convs reuse the downsample pair structure (spconv's indice_key sharing).
BatchNorm uses the reference's eps=1e-3, momentum=0.01.

Inputs are the grid-sampled points' discrete coords (``discrete_coord``
from GridSample) — the voxel set IS the point set, as in the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm
from ao_tpu.ops.sparse_conv import (
    build_table,
    kernel_offsets,
    neighbor_idx,
    sparse_conv_apply,
    sparse_downsample,
)

_K2 = kernel_offsets(2)  # (8, 3) offsets {0,1}^3


class SubMConv(nn.Module):
    """Submanifold conv: output sites == input sites."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat, nbr_idx, nbr_valid):
        K = nbr_idx.shape[2]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(0.02),
            (K, feat.shape[-1], self.out_channels),
        )
        out = sparse_conv_apply(feat, nbr_idx, nbr_valid, kernel)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
        return out


class SparseBN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, mask, ura):
        return PointBatchNorm(self.features, momentum=0.01, eps=1e-3)(
            x, mask, ura
        )


class BasicBlock(nn.Module):
    """Residual block of two k=3 submanifold convs
    (reference: spconv_unet_v1m1_base.py:22-87)."""

    channels: int

    @nn.compact
    def __call__(self, feat, mask, nbr_idx, nbr_valid, ura):
        C = self.channels
        if feat.shape[-1] != C:
            k1 = kernel_offsets(1)
            one_idx = jnp.broadcast_to(
                jnp.arange(feat.shape[1], dtype=jnp.int32)[None, :, None],
                (feat.shape[0], feat.shape[1], 1),
            )
            residual = SubMConv(C, 1, name="proj")(
                feat, one_idx, mask[:, :, None]
            )
            residual = SparseBN(C, name="proj_bn")(residual, mask, ura)
        else:
            residual = feat
        h = SubMConv(C, 3, name="conv1")(feat, nbr_idx, nbr_valid)
        h = nn.relu(SparseBN(C, name="bn1")(h, mask, ura))
        h = SubMConv(C, 3, name="conv2")(h, nbr_idx, nbr_valid)
        h = SparseBN(C, name="bn2")(h, mask, ura)
        h = nn.relu(h + residual)
        return jnp.where(mask[..., None], h, 0.0)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck residual block with expansion 4 — the block the
    deeper MinkUNet variants (50/101) are built from (reference:
    mink_unet.py:95-156). ``channels`` is the bottleneck width; the block
    output carries ``channels * 4``."""

    channels: int
    expansion: int = 4

    @nn.compact
    def __call__(self, feat, mask, nbr_idx, nbr_valid, ura):
        C = self.channels
        CO = C * self.expansion
        one_idx = jnp.broadcast_to(
            jnp.arange(feat.shape[1], dtype=jnp.int32)[None, :, None],
            (feat.shape[0], feat.shape[1], 1),
        )
        if feat.shape[-1] != CO:
            residual = SubMConv(CO, 1, name="proj")(
                feat, one_idx, mask[:, :, None]
            )
            residual = SparseBN(CO, name="proj_bn")(residual, mask, ura)
        else:
            residual = feat
        h = SubMConv(C, 1, name="conv1")(feat, one_idx, mask[:, :, None])
        h = nn.relu(SparseBN(C, name="bn1")(h, mask, ura))
        h = SubMConv(C, 3, name="conv2")(h, nbr_idx, nbr_valid)
        h = nn.relu(SparseBN(C, name="bn2")(h, mask, ura))
        h = SubMConv(CO, 1, name="conv3")(h, one_idx, mask[:, :, None])
        h = SparseBN(CO, name="bn3")(h, mask, ura)
        h = nn.relu(h + residual)
        return jnp.where(mask[..., None], h, 0.0)


@MODELS.register_module("SpUNet-v1m1")
class SpUNet(nn.Module):
    in_channels: int
    num_classes: int
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)
    cls_mode: bool = False
    # residual block family: "basic" (2x k3) or "bottleneck" (1-3-1,
    # expansion 4 — MinkUNet50/101, reference mink_unet.py:385-397)
    block: str = "basic"
    # MinkUNet skeleton (reference mink_unet.py:174-306): the stride-2
    # encoder convs keep their channel count (conv1p1s2..conv4p8s2 are
    # inplanes -> inplanes) and the stage's first residual block does the
    # channel projection; SpUNet's down convs change channels directly.
    mink_skeleton: bool = False
    # static voxel capacity per downsample stage (fraction of previous)
    stage_cap_ratios: Tuple[float, ...] = (0.5, 0.5, 0.5, 0.5)

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False, discrete_coord=None):
        """coord is used to derive voxel coords when ``discrete_coord`` is
        not given (assumes grid-sampled input; reference feeds GridSample's
        discrete_coord)."""
        ura = use_running_average
        num_stages = len(self.layers) // 2
        if discrete_coord is None:
            lo = jnp.min(
                jnp.where(mask[..., None], coord, np.float32(1e30)), axis=1
            )
            discrete_coord = jnp.floor(coord - lo[:, None, :]).astype(jnp.int32)
        dc = jnp.where(mask[..., None], discrete_coord, 0)

        # stem: k=5 submanifold conv
        table = build_table(dc, mask)
        idx5, val5 = neighbor_idx(table, dc, dc, mask, kernel_offsets(5))
        h = SubMConv(self.base_channels, 5, name="conv_input")(feat, idx5, val5)
        h = nn.relu(
            SparseBN(self.base_channels, name="bn_input")(h, mask, ura)
        )

        offs3 = kernel_offsets(3)
        skips = []  # (dc, feat, mask, parent)
        cap = dc.shape[1]
        cur_dc, cur_mask = dc, mask
        for s in range(num_stages):
            cap = max(int(cap * self.stage_cap_ratios[s]), 32)
            out_dc, out_mask, parent = sparse_downsample(cur_dc, cur_mask, cap)
            # k=2 s=2 conv: gather the 2^3 block members of each out site
            in_table = build_table(cur_dc, cur_mask)
            idx2, val2 = neighbor_idx(
                in_table, cur_dc, out_dc, out_mask, _K2, stride=2
            )
            skips.append((cur_dc, h, cur_mask, parent))
            down_c = h.shape[-1] if self.mink_skeleton else self.channels[s]
            h = SubMConv(down_c, 2, name=f"down{s}")(h, idx2, val2)
            h = nn.relu(
                SparseBN(down_c, name=f"down{s}_bn")(h, out_mask, ura)
            )
            cur_dc, cur_mask = out_dc, out_mask
            table_s = build_table(cur_dc, cur_mask)
            idx3, val3 = neighbor_idx(table_s, cur_dc, cur_dc, cur_mask, offs3)
            Block = Bottleneck if self.block == "bottleneck" else BasicBlock
            for i in range(self.layers[s]):
                h = Block(self.channels[s], name=f"enc{s}_block{i}")(
                    h, cur_mask, idx3, val3, ura
                )

        if not self.cls_mode:
            for s in reversed(range(num_stages)):
                fine_dc, skip_feat, fine_mask, parent = skips[s]
                dec_c = self.channels[len(self.channels) - s - 2]
                # inverse k=2 conv: route each fine site's parent feature
                # through the kernel slot given by its in-block position
                slot = (
                    (fine_dc[..., 0] % 2) * 4
                    + (fine_dc[..., 1] % 2) * 2
                    + (fine_dc[..., 2] % 2)
                )
                kernel = self.param(
                    f"up{s}_kernel",
                    nn.initializers.truncated_normal(0.02),
                    (8, h.shape[-1], dec_c),
                )
                parent_feat = jnp.take_along_axis(
                    h, parent[..., None], axis=1
                )
                slot_onehot = jnp.eye(8, dtype=h.dtype)[slot]
                up = jnp.einsum(
                    "bmk,kcd,bmc->bmd", slot_onehot, kernel, parent_feat
                )
                up = nn.relu(
                    SparseBN(dec_c, name=f"up{s}_bn")(up, fine_mask, ura)
                )
                h = jnp.concatenate([up, skip_feat], axis=-1)
                table_f = build_table(fine_dc, fine_mask)
                idx3, val3 = neighbor_idx(
                    table_f, fine_dc, fine_dc, fine_mask, offs3
                )
                Block = Bottleneck if self.block == "bottleneck" else BasicBlock
                for i in range(self.layers[len(self.channels) - s - 1]):
                    h = Block(dec_c, name=f"dec{s}_block{i}")(
                        h, fine_mask, idx3, val3, ura
                    )
                cur_dc, cur_mask = fine_dc, fine_mask

        if self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="final")(h)
        if self.cls_mode:
            mm = cur_mask[..., None].astype(h.dtype)
            h = (h * mm).sum(axis=1) / jnp.maximum(mm.sum(axis=1), 1.0)
        return h


def _spunet_v1m2(bn_momentum=None, **kwargs):
    """SpUNet-v1m2 (reference v1m2 differs only in BN momentum handling;
    flax BatchNorm momentum is fixed at construction, so the config knob
    is accepted and ignored — statistics are exact either way)."""
    return SpUNet(**kwargs)


MODELS.register_module(name="SpUNet-v1m2", module=_spunet_v1m2)
