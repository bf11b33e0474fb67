"""MinkUNet variants and SPVCNN on the TPU sparse-conv primitives.

MinkUNet (reference: pointcept/models/sparse_unet/mink_unet.py:159-443,
MinkowskiEngine-backed) shares the SpUNet U-Net topology — stem conv,
four stride-2 encoder stages and four transpose-decoder stages of residual
blocks — differing only in per-variant LAYERS/PLANES; the variants are
registered as configurations of the TPU SpUNet.

SPVCNN (reference: pointcept/models/spvcnn/ts_spvcnn.py:179-436,
torchsparse-backed) adds a full-resolution point branch fused with the
voxel U-Net at every stage boundary; see the SPVCNN class docstring for
the fusion scheme (devoxelize via 3-NN interpolation, re-voxelise via
scatter-mean over composed downsample parent maps).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm
from ao_tpu.ops.interpolation import interpolation
from ao_tpu.ops.sparse_conv import (
    build_table,
    kernel_offsets,
    neighbor_idx,
    sparse_downsample,
)

from .spunet import BasicBlock, SparseBN, SpUNet, SubMConv, _K2

# (layers, planes) per MinkUNet variant (reference mink_unet.py:366-441)
_MINK_VARIANTS = {
    "MinkUNet14": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet34": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet50": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet101": ((2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14A": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14B": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet14C": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet14D": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18A": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18B": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet18D": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet34A": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet34B": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32)),
    "MinkUNet34C": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
}


# variants built from the 1-3-1 Bottleneck block (expansion 4) rather
# than BasicBlock (reference mink_unet.py:385-397)
_MINK_BOTTLENECK = {"MinkUNet50", "MinkUNet101"}


def _register_mink(name, layers, planes):
    def factory(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("channels", planes)
        kwargs.setdefault("mink_skeleton", True)
        if name in _MINK_BOTTLENECK:
            kwargs.setdefault("block", "bottleneck")
        return SpUNet(**kwargs)

    MODELS.register_module(name=name, module=factory)


for _name, (_layers, _planes) in _MINK_VARIANTS.items():
    _register_mink(_name, _layers, _planes)


def _segment_mean(values, seg, mask, num_segments):
    """Per-segment mean of (B, N, C) values under a (B, N) segment map
    (the reference's point_to_voxel scatter-mean, torchsparse devoxelize
    inverse)."""

    def one(v, c, m):
        cid = jnp.where(m, c, num_segments)
        s = jax.ops.segment_sum(
            jnp.where(m[:, None], v, 0.0), cid, num_segments=num_segments + 1
        )[:num_segments]
        n = jax.ops.segment_sum(
            m.astype(v.dtype), cid, num_segments=num_segments + 1
        )[:num_segments]
        return s / jnp.maximum(n[:, None], 1.0)

    return jax.vmap(one)(values, seg, mask)


class _PointTransform(nn.Module):
    """Linear -> BN -> ReLU point-branch transform
    (reference ts_spvcnn.py:355-373)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, mask, ura):
        h = nn.Dense(self.out_channels)(x)
        h = PointBatchNorm(self.out_channels)(h, mask, ura)
        return nn.relu(h)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    """SPVCNN (reference: pointcept/models/spvcnn/ts_spvcnn.py:179-436,
    torchsparse): a sparse voxel U-Net with a full-resolution point branch
    fused at every stage boundary — z1 = devoxelize(x4) + pt0(z0) before
    the decoder, z2 = devoxelize(y2) + pt1(z1) at the decoder midpoint
    (both re-voxelised with a scatter-mean and dropout before continuing),
    z3 = y4 + pt2(z2) at the head. The reference's trilinear devoxelize
    becomes 3-NN inverse-distance interpolation from voxel centers; its
    point_to_voxel scatter-mean uses the composed downsample parent maps.
    """

    in_channels: int
    out_channels: int
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    stage_cap_ratios: Tuple[float, ...] = (0.5, 0.5, 0.5, 0.5)
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False, discrete_coord=None):
        ura = use_running_average
        if discrete_coord is None:
            lo = jnp.min(
                jnp.where(mask[..., None], coord, np.float32(1e30)), axis=1
            )
            discrete_coord = jnp.floor(coord - lo[:, None, :]).astype(jnp.int32)
        dc0 = jnp.where(mask[..., None], discrete_coord, 0)
        offs3 = kernel_offsets(3)

        def subm_block_stack(h, dc, m, C, n_blocks, prefix):
            table = build_table(dc, m)
            i3, v3 = neighbor_idx(table, dc, dc, m, offs3)
            for i in range(n_blocks):
                h = BasicBlock(C, name=f"{prefix}_block{i}")(h, m, i3, v3, ura)
            return h

        # ---- stem (3^3 subm convs, ts_spvcnn.py stem) -> z0 == x0 at
        # full resolution (voxel set == grid-sampled point set, so the
        # initial devoxelize is the identity)
        table0 = build_table(dc0, mask)
        i30, v30 = neighbor_idx(table0, dc0, dc0, mask, offs3)
        h = SubMConv(self.base_channels, 3, name="stem_conv1")(feat, i30, v30)
        h = nn.relu(SparseBN(self.base_channels, name="stem_bn1")(h, mask, ura))
        h = SubMConv(self.base_channels, 3, name="stem_conv2")(h, i30, v30)
        h = nn.relu(SparseBN(self.base_channels, name="stem_bn2")(h, mask, ura))
        z0 = h

        # ---- encoder: 4 stride-2 stages, keeping every skip
        skips = []  # (dc, feat, mask, parent) at the INPUT of each stage
        cap = dc0.shape[1]
        cur_dc, cur_mask = dc0, mask
        point_parent = None  # full-res point -> current-level voxel map
        centers = []  # continuous centers (base-voxel units) per level
        for s in range(4):
            cap = max(int(cap * self.stage_cap_ratios[s]), 32)
            out_dc, out_mask, parent = sparse_downsample(cur_dc, cur_mask, cap)
            in_table = build_table(cur_dc, cur_mask)
            i2, v2 = neighbor_idx(in_table, cur_dc, out_dc, out_mask, _K2,
                                  stride=2)
            skips.append((cur_dc, h, cur_mask, parent))
            h = SubMConv(self.channels[s], 2, name=f"down{s}")(h, i2, v2)
            h = nn.relu(
                SparseBN(self.channels[s], name=f"down{s}_bn")(h, out_mask, ura)
            )
            cur_dc, cur_mask = out_dc, out_mask
            h = subm_block_stack(h, cur_dc, cur_mask, self.channels[s],
                                 self.layers[s], f"enc{s}")
            # compose the full-res point -> voxel parent map
            point_parent = (
                parent if point_parent is None
                else jnp.take_along_axis(parent, point_parent, axis=1)
            )
            centers.append(
                (cur_dc.astype(jnp.float32) + 0.5) * float(2 ** (s + 1))
            )

        pcoord = dc0.astype(jnp.float32) + 0.5  # full-res positions

        # ---- bottleneck fusion: z1 = devoxelize(x4) + pt0(z0)
        z1 = interpolation(centers[3], pcoord, h, cur_mask, mask, k=3)
        z1 = z1 + _PointTransform(self.channels[3], name="point_transform0")(
            z0, mask, ura
        )
        # y1 = point_to_voxel(x4, z1) with dropout (ts_spvcnn.py:411-413)
        h = _segment_mean(z1, point_parent, mask, h.shape[1])
        h = jnp.where(cur_mask[..., None], h, 0.0)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)

        # ---- decoder stages 0,1 (up1, up2)
        def up_stage(h, s, dec_c, prefix):
            fine_dc, skip_feat, fine_mask, parent = skips[s]
            slot = (
                (fine_dc[..., 0] % 2) * 4
                + (fine_dc[..., 1] % 2) * 2
                + (fine_dc[..., 2] % 2)
            )
            kernel = self.param(
                f"{prefix}_kernel", nn.initializers.truncated_normal(0.02),
                (8, h.shape[-1], dec_c),
            )
            parent_feat = jnp.take_along_axis(h, parent[..., None], axis=1)
            up = jnp.einsum(
                "bmk,kcd,bmc->bmd",
                jnp.eye(8, dtype=h.dtype)[slot], kernel, parent_feat,
            )
            up = nn.relu(SparseBN(dec_c, name=f"{prefix}_bn")(up, fine_mask, ura))
            h = jnp.concatenate([up, skip_feat], axis=-1)
            h = subm_block_stack(h, fine_dc, fine_mask, dec_c,
                                 self.layers[4 + (3 - s)], prefix + "_blocks")
            return h, fine_dc, fine_mask

        h, cur_dc, cur_mask = up_stage(h, 3, self.channels[4], "up0")
        h, cur_dc, cur_mask = up_stage(h, 2, self.channels[5], "up1")

        # ---- mid-decoder fusion: z2 = devoxelize(y2) + pt1(z1)
        z2 = interpolation(centers[1], pcoord, h, cur_mask, mask, k=3)
        z2 = z2 + _PointTransform(self.channels[5], name="point_transform1")(
            z1, mask, ura
        )
        # re-voxelise at the y2 level: compose parents of stages 0,1
        p01 = jnp.take_along_axis(
            skips[1][3], skips[0][3], axis=1
        )  # full-res -> level-2 voxels
        h = _segment_mean(z2, p01, mask, h.shape[1])
        h = jnp.where(cur_mask[..., None], h, 0.0)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)

        # ---- decoder stages 2,3 (up3, up4) back to full resolution
        h, cur_dc, cur_mask = up_stage(h, 1, self.channels[6], "up2")
        h, cur_dc, cur_mask = up_stage(h, 0, self.channels[7], "up3")

        # ---- head fusion: z3 = y4 + pt2(z2) (y4 is full-res: identity
        # devoxelize)
        z3 = h + _PointTransform(self.channels[7], name="point_transform2")(
            z2, mask, ura
        )
        out = nn.Dense(self.out_channels, name="final")(z3)
        return jnp.where(mask[..., None], out, 0.0)
