"""OctFormer — octree attention transformer.

TPU-native re-implementation of the reference OctFormer-v1m1
(reference: pointcept/models/octformer/octformer_v1m1_base.py:495-614,
ocnn/dwconv-backed). The key insight transfers directly: octree attention
is attention over fixed-size groups of z-order-contiguous points (an
octree traversal IS a Morton sort). Here points are sorted by Morton code
once per stage and attention runs over contiguous groups of
``patch_size`` points — dense (G, K, K) MXU matmuls — with alternating
*dilated* groups (stride-``dilation`` interleaving, the reference's
dilated octree attention). Conditional positional encodings come from a
depthwise-style kNN conv; downsampling is grid pooling.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import DropPath
from ao_tpu.ops import grid_pool, grouping, grouping_with_rel_coord, knn_query
from ao_tpu.ops.interpolation import interpolation
from ao_tpu.ops.knn_spatial import morton_code


def _dilate_order(N: int, dilation: int) -> np.ndarray:
    """Interleave a length-N sequence with the given stride so each
    contiguous group holds every ``dilation``-th point."""
    return (
        np.arange(N).reshape(-1, dilation).T.reshape(-1)
        if N % dilation == 0
        else np.arange(N)
    )


class OctreeAttention(nn.Module):
    channels: int
    num_heads: int
    patch_size: int = 32
    dilation: int = 1
    use_rpe: bool = True

    @nn.compact
    def __call__(self, feat, mask, xyz=None, deterministic=True):
        """feat (B, N, C) in Morton order; groups are contiguous runs.
        ``xyz`` (B, N, 3) int32 octree-cell coordinates at this stage's
        depth enable the reference's relative-position bias
        (octformer_v1m1_base.py:151-182: per-axis table of
        2*int(0.8*K*sqrt(dilation))+1 offsets per head, summed over
        axes and added to the attention logits)."""
        B, N, C = feat.shape
        K = self.patch_size
        H = self.num_heads
        hd = C // H
        # pad N to a multiple of patch_size * dilation
        Np = -(-N // (K * self.dilation)) * (K * self.dilation)
        feat_p = jnp.pad(feat, ((0, 0), (0, Np - N), (0, 0)))
        mask_p = jnp.pad(mask, ((0, 0), (0, Np - N)))
        order = jnp.asarray(_dilate_order(Np, self.dilation))
        f = feat_p[:, order]
        m = mask_p[:, order]
        G = Np // K
        qkv = nn.Dense(3 * C, name="qkv")(f).reshape(B, G, K, 3, H, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        attn = jnp.einsum("bgqhd,bgkhd->bghqk", q, k) * (hd**-0.5)
        if self.use_rpe and xyz is not None:
            pos_bnd = int(0.8 * K * self.dilation ** 0.5)
            rpe_num = 2 * pos_bnd + 1
            table = self.param(
                "rpe_table", nn.initializers.truncated_normal(0.02),
                (3 * rpe_num, H),
            )
            x = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)))[:, order]
            xg = x.reshape(B, G, K, 3)
            rel = xg[:, :, :, None, :] - xg[:, :, None, :, :]  # q - k
            idx = (
                jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd
                + jnp.arange(3, dtype=jnp.int32) * rpe_num
            )
            bias = jnp.take(table, idx, axis=0).sum(-2)  # (B,G,K,K,H)
            attn = attn + bias.transpose(0, 1, 4, 2, 3)
        mg = m.reshape(B, G, K)
        attn = jnp.where(mg[:, :, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bghqk,bgkhd->bgqhd", attn, v).reshape(B, Np, C)
        out = nn.Dense(C, name="proj")(out)
        inv = jnp.argsort(order)
        out = out[:, inv][:, :N]
        return jnp.where(mask[..., None], out, 0.0)


class OctFormerBlock(nn.Module):
    channels: int
    num_heads: int
    patch_size: int = 32
    dilation: int = 1
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    rpe_grid: float = 0.04  # octree cell size at this stage's depth

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic=True):
        C = self.channels
        # conditional positional encoding: kNN depthwise conv
        idx, _, valid = knn_query(8, coord, mask)
        rel = grouping_with_rel_coord(coord, coord, idx, valid)
        nf = grouping(feat, idx, valid)
        pe_w = self.param(
            "cpe_kernel", nn.initializers.truncated_normal(0.02), (8, 3, C)
        )
        cpe = jnp.einsum("bnks,ksc->bnc", rel, pe_w) + jnp.mean(nf, axis=2)
        feat = feat + jnp.where(mask[..., None], cpe, 0.0)

        h = nn.LayerNorm()(feat)
        xyz = jnp.floor(coord / self.rpe_grid).astype(jnp.int32)
        h = OctreeAttention(
            C, self.num_heads, self.patch_size, self.dilation, name="attn"
        )(h, mask, xyz, deterministic)
        feat = feat + DropPath(self.drop_path)(h, deterministic)
        y = nn.LayerNorm()(feat)
        y = nn.Dense(int(C * self.mlp_ratio))(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C)(y)
        feat = feat + DropPath(self.drop_path)(y, deterministic)
        return jnp.where(mask[..., None], feat, 0.0)


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    in_channels: int
    num_classes: int
    channels: Tuple[int, ...] = (96, 192, 384, 384)
    num_heads: Tuple[int, ...] = (6, 12, 24, 24)
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    patch_size: int = 32
    dilation: int = 4
    grid_sizes: Tuple[float, ...] = (0.08, 0.16, 0.32)
    drop_path_rate: float = 0.5
    stage_cap_ratios: Tuple[float, ...] = (0.35, 0.35, 0.35)

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        num_stages = len(self.channels)
        dp = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # Morton-sort once per stage so octree groups are curve-contiguous
        def sort_stage(c, f, m):
            code = morton_code(c, m)
            order = jnp.argsort(code, axis=1)
            take = lambda x: jnp.take_along_axis(
                x, order[..., None] if x.ndim == 3 else order, axis=1
            )
            return take(c), take(f), take(m)

        h = nn.Dense(self.channels[0], name="embed")(feat)
        coord, h, mask = sort_stage(coord, h, mask)

        skips = []
        bi = 0
        cap = coord.shape[1]
        for s in range(num_stages):
            if s > 0:
                cap = max(int(cap * self.stage_cap_ratios[s - 1]), 64)
                pc, pf, pm, _, _ = grid_pool(
                    coord, nn.Dense(self.channels[s], name=f"down{s}")(h),
                    mask, self.grid_sizes[s - 1], cap,
                )
                skips.append((coord, h, mask))
                coord, h, mask = sort_stage(pc, pf, pm)
            for d in range(self.depths[s]):
                h = OctFormerBlock(
                    channels=self.channels[s],
                    num_heads=self.num_heads[s],
                    patch_size=self.patch_size,
                    dilation=1 if d % 2 == 0 else self.dilation,
                    drop_path=float(dp[bi]),
                    rpe_grid=(self.grid_sizes[s - 1] if s > 0
                              else self.grid_sizes[0] / 2),
                    name=f"stage{s}_block{d}",
                )(coord, h, mask, deterministic)
                bi += 1

        for s in reversed(range(num_stages - 1)):
            skip_coord, skip_feat, skip_mask = skips[s]
            up = interpolation(coord, skip_coord, h, mask, skip_mask, k=3)
            up = nn.Dense(self.channels[s], name=f"up{s}")(up)
            h = up + nn.Dense(self.channels[s], name=f"up{s}_skip")(skip_feat)
            coord, mask = skip_coord, skip_mask

        if self.num_classes > 0:
            g = nn.LayerNorm()(h)
            h = nn.Dense(self.num_classes)(g)
        return h
