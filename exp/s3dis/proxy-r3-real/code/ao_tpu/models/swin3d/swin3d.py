"""Swin3D — shifted-window transformer on sparse voxels with cRSE.

TPU-native re-implementation of the reference Swin3D-v1m1
(reference: pointcept/models/swin3d/swin3d_v1m1_base.py:13-214 and
swin3d_layers.py, backed by MinkowskiEngine + custom CUDA attention):

* **cRSE** (contextual relative signal embedding, swin3d_layers.py:383-577):
  every in-window (query, key) pair looks up learned per-head tables
  indexed by the quantised relative xyz / color / normal signal and adds
  query-side and key-side dot products to the attention logits plus a
  value-side vector to the aggregation. The CUDA kernel's per-pair table
  walk becomes MXU-friendly algebra here: the q/k table dot products are
  precomputed for *all* table entries (an einsum over the table length)
  and gathered per pair; the value-side sum is a histogram of attention
  mass over table bins (one-hot einsum) contracted with the value table.
* windows are capacity-bounded dense buffers (ops/window_partition.py) —
  attention is plain batched masked attention on the MXU; alternate
  blocks shift the grid by half a window (get_shifted_sp,
  swin3d_layers.py:825-839).
* GridKNNDownsample (swin3d_layers.py:273-315): stride-2 voxel pooling
  for positions, feature = max over Linear(LN(feat)) of the k=16 nearest
  old points; signals mean-pool over the voxel members.
* Upsample 'linear' (swin3d_layers.py:319-378): linear1(skip) +
  3-NN inverse-distance interpolation of linear2(coarse).
* stem: 3^3 submanifold sparse conv (MinkConvBNRelu, mink_layers.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import DropPath, PointBatchNorm
from ao_tpu.ops import grid_pool, grouping, knn
from ao_tpu.ops.interpolation import interpolation
from ao_tpu.ops.sparse_conv import build_table, kernel_offsets, neighbor_idx, \
    sparse_conv_apply
from ao_tpu.ops.window_partition import pack_windows, window_ids


def _segment_mean(values, cluster, mask, num_segments):
    """Per-cluster mean of (B, N, C) values under a (B, N) cluster map."""

    def one(v, c, m):
        seg = jnp.where(m, c, num_segments)
        s = jax.ops.segment_sum(
            jnp.where(m[:, None], v, 0.0), seg, num_segments=num_segments + 1
        )[:num_segments]
        n = jax.ops.segment_sum(
            m.astype(v.dtype), seg, num_segments=num_segments + 1
        )[:num_segments]
        return s / jnp.maximum(n[:, None], 1.0)

    return jax.vmap(one)(values, cluster, mask)


class WindowAttentionCRSE(nn.Module):
    """W-MSA with contextual relative signal embedding
    (reference swin3d_layers.py:383-577)."""

    dim: int
    num_heads: int
    window_size: int  # voxels per window edge
    quant_size: int = 4  # table bins per voxel (reference quant_size)
    signal_modes: Tuple[str, ...] = ("xyz", "rgb")
    qkv_bias: bool = True

    def _tables(self, name, length):
        shape = (3, length, self.num_heads, self.dim // self.num_heads)
        init = nn.initializers.truncated_normal(0.02)
        return (
            self.param(f"{name}_q_table", init, shape),
            self.param(f"{name}_k_table", init, shape),
            self.param(f"{name}_v_table", init, shape),
        )

    def _mode_params(self, mode):
        # table length + index scale per modality (reference:
        # WindowAttention.__init__ :436-470 — xyz spans the window in
        # voxel units, color/normal span [-1, 1] i.e. "windowsize" 2)
        if mode == "xyz":
            L = 2 * self.window_size * self.quant_size
            scale = float(self.quant_size)
        else:
            L = 2 * 2 * (2 * self.quant_size)
            scale = float(2 * self.quant_size)
        return L, scale

    @nn.compact
    def __call__(self, x, sig, valid):
        """x (W, S, C) window-packed features; sig (W, S, 3*len(modes))
        signals (xyz in voxel units first, then rgb/norm in [-1, 1]);
        valid (W, S) slot mask."""
        W, S, C = x.shape
        H = self.num_heads
        D = C // H
        scale = D ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(W, S, 3, H, D), 3, axis=2)
        q = q[:, :, 0] * scale  # (W, S, H, D)
        k = k[:, :, 0]
        v = v[:, :, 0]

        logits = jnp.einsum("wahd,wbhd->wabh", q, k)  # (W, S, S, H)
        attn_mask = valid[:, None, :, None]  # keys
        value_tables = []  # (idx, Tv, L) per modality, used after softmax
        for mi, mode in enumerate(self.signal_modes):
            L, idx_scale = self._mode_params(mode)
            Tq, Tk, Tv = self._tables(mode, L)
            s = sig[:, :, 3 * mi:3 * mi + 3]  # (W, S, 3)
            delta = s[:, :, None, :] - s[:, None, :, :]  # (W, S, S, 3)
            idx = jnp.clip(
                jnp.floor(delta * idx_scale).astype(jnp.int32) + L // 2,
                0, L - 1,
            )
            # q-side: precompute q . Tq for every bin, gather per pair
            sq = jnp.einsum("wahd,xlhd->waxlh", q, Tq)  # (W, S, 3, L, H)
            sk = jnp.einsum("wbhd,xlhd->wbxlh", k, Tk)
            for ax in range(3):
                ia = idx[..., ax]  # (W, S, S)
                ga = jnp.take_along_axis(
                    sq[:, :, ax],  # (W, S(a), L, H)
                    jnp.broadcast_to(ia[..., None], (W, S, S, H)),
                    axis=2,
                )  # (W, S(a), S(b), H)
                ib = jnp.swapaxes(ia, 1, 2)
                gb = jnp.take_along_axis(
                    sk[:, :, ax],  # (W, S(b), L, H)
                    jnp.broadcast_to(ib[..., None], (W, S, S, H)),
                    axis=2,
                )
                logits = logits + ga + jnp.swapaxes(gb, 1, 2)
            value_tables.append((idx, Tv, L))

        logits = jnp.where(attn_mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=2)
        attn = jnp.where(attn_mask, attn, 0.0)

        out = jnp.einsum("wabh,wbhd->wahd", attn, v)
        # value-side cRSE: histogram attention mass per table bin, then
        # contract with the value table (avoids a (W,S,S,H,D) gather)
        for idx, Tv, L in value_tables:
            for ax in range(3):
                onehot = jax.nn.one_hot(idx[..., ax], L, dtype=attn.dtype)
                hist = jnp.einsum("wabh,wabl->walh", attn, onehot)
                out = out + jnp.einsum("walh,lhd->wahd", hist, Tv[ax])

        out = out.reshape(W, S, C)
        out = nn.Dense(C, name="proj")(out)
        return jnp.where(valid[..., None], out, 0.0)


class SwinBlockCRSE(nn.Module):
    """LN -> cRSE window attention -> residual, LN -> MLP(4x, GELU) ->
    residual (reference SwinTransformerBlock, swin3d_layers.py:579-627)."""

    dim: int
    num_heads: int
    window_size: int  # voxels
    voxel_size: float
    quant_size: int
    shift: bool
    num_windows: int
    window_capacity: int
    signal_modes: Tuple[str, ...]
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, coord, feat, sig_rest, mask, deterministic=True):
        wid = window_ids(
            coord, mask, self.window_size * self.voxel_size, shift=self.shift
        )
        pidx, slot_valid, win_of_point, slot_of_point = pack_windows(
            wid, self.num_windows, self.window_capacity
        )

        h = nn.LayerNorm(name="norm1")(feat)
        sig = jnp.concatenate([coord / self.voxel_size, sig_rest], axis=-1)

        def gather(x):
            g = jnp.take_along_axis(
                x.reshape(x.shape[0], -1, x.shape[-1]),
                pidx.reshape(x.shape[0], -1, 1).astype(jnp.int32),
                axis=1,
            )
            return g.reshape(
                x.shape[0], self.num_windows, self.window_capacity, x.shape[-1]
            )

        hw = gather(h) * slot_valid[..., None]
        sw = gather(sig)
        B = feat.shape[0]

        attn = WindowAttentionCRSE(
            self.dim, self.num_heads, self.window_size,
            quant_size=self.quant_size, signal_modes=self.signal_modes,
            name="attn",
        )
        # fold the batch into the window axis: windows are independent
        out_w = attn(
            hw.reshape(-1, self.window_capacity, self.dim),
            sw.reshape(-1, self.window_capacity, sw.shape[-1]),
            slot_valid.reshape(-1, self.window_capacity),
        ).reshape(B, self.num_windows, self.window_capacity, self.dim)

        # scatter back: points in dropped/overflow windows pass through
        flat = out_w.reshape(B, -1, self.dim)
        gidx = win_of_point * self.window_capacity + slot_of_point
        ok = win_of_point >= 0
        gidx = jnp.where(ok, gidx, 0)
        h_attn = jnp.take_along_axis(
            flat, gidx[..., None].astype(jnp.int32), axis=1
        )
        h_attn = jnp.where(ok[..., None], h_attn, 0.0)

        feat = feat + DropPath(self.drop_path)(h_attn, deterministic)
        mlp = nn.Sequential([
            nn.Dense(4 * self.dim), nn.gelu, nn.Dense(self.dim),
        ])
        feat = feat + DropPath(self.drop_path)(
            mlp(nn.LayerNorm(name="norm2")(feat)), deterministic
        )
        return jnp.where(mask[..., None], feat, 0.0)


@MODELS.register_module("Swin3D-v1m1")
class Swin3D(nn.Module):
    """Swin3D U-Net (reference swin3d_v1m1_base.py:13-214). ``feat`` must
    carry the color signal in channels ``color_channels`` (the standard
    Collect(feat_keys=(coord, color)) layout puts it at 3:6); normals, if
    ``signal_modes`` includes "norm", at ``normal_channels``."""

    in_channels: int
    num_classes: int
    base_grid_size: float = 0.02
    channels: Tuple[int, ...] = (48, 96, 192, 384, 384)
    num_heads: Tuple[int, ...] = (6, 6, 12, 24, 24)
    depths: Tuple[int, ...] = (2, 4, 9, 4, 4)
    window_sizes: Tuple[int, ...] = (5, 7, 7, 7, 7)
    quant_size: int = 4
    signal_modes: Tuple[str, ...] = ("xyz", "rgb")
    color_channels: Tuple[int, int] = (3, 6)
    normal_channels: Optional[Tuple[int, int]] = None
    drop_path_rate: float = 0.3
    up_k: int = 3
    knn_down_k: int = 16
    stage_cap_ratios: Tuple[float, ...] = (0.4, 0.4, 0.4, 0.4)
    window_occupancy: float = 0.25  # num_windows cap as fraction of points
    window_capacity: int = 64

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        ura = use_running_average
        num_stages = len(self.channels)
        dp = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # continuous per-point signals riding alongside features
        sig_parts = []
        if "rgb" in self.signal_modes:
            lo, hi = self.color_channels
            sig_parts.append(feat[..., lo:hi])
        if "norm" in self.signal_modes:
            lo, hi = self.normal_channels
            sig_parts.append(feat[..., lo:hi])
        sig_rest = (
            jnp.concatenate(sig_parts, axis=-1)
            if sig_parts
            else jnp.zeros(feat.shape[:2] + (0,), feat.dtype)
        )

        # 3^3 submanifold sparse-conv stem (MinkConvBNRelu)
        big = np.float32(1e30)
        lo3 = jnp.min(jnp.where(mask[..., None], coord, big), axis=1)
        dc = jnp.floor(
            (coord - lo3[:, None, :]) / self.base_grid_size
        ).astype(jnp.int32)
        dc = jnp.where(mask[..., None], dc, 0)
        table = build_table(dc, mask)
        idx3, val3 = neighbor_idx(table, dc, dc, mask, kernel_offsets(3))
        stem = self.param(
            "stem_kernel", nn.initializers.truncated_normal(0.02),
            (27, self.in_channels, self.channels[0]),
        )
        h = sparse_conv_apply(feat, idx3, val3, stem)
        h = nn.relu(PointBatchNorm(self.channels[0], name="stem_bn")(h, mask, ura))

        skips = []
        bi = 0
        cap = coord.shape[1]
        voxel = self.base_grid_size
        for s in range(num_stages):
            num_windows = max(int(coord.shape[1] * self.window_occupancy), 16)
            for d in range(self.depths[s]):
                h = SwinBlockCRSE(
                    dim=self.channels[s],
                    num_heads=self.num_heads[s],
                    window_size=self.window_sizes[s],
                    voxel_size=voxel,
                    quant_size=self.quant_size,
                    shift=(d % 2 == 1),
                    num_windows=num_windows,
                    window_capacity=self.window_capacity,
                    signal_modes=self.signal_modes,
                    drop_path=float(dp[bi]),
                    name=f"stage{s}_block{d}",
                )(coord, h, sig_rest, mask, deterministic)
                bi += 1
            if s == num_stages - 1:
                break
            # GridKNNDownsample: stride-2 voxel centers; feature = max over
            # Linear(LN(feat)) of the k nearest previous-level points
            skips.append((coord, h, mask))
            cap = max(int(cap * self.stage_cap_ratios[s]), 64)
            voxel = voxel * 2
            pc, _, pm, cluster, _ = grid_pool(coord, h, mask, voxel, cap)
            sig_down = _segment_mean(sig_rest, cluster, mask, cap)
            hn = nn.Dense(
                self.channels[s + 1], use_bias=False, name=f"down{s}_linear"
            )(nn.LayerNorm(name=f"down{s}_norm")(h))
            nidx, _, nvalid = knn(pc, coord, self.knn_down_k, pm, mask)
            gathered = grouping(hn, nidx, nvalid)  # (B, M, k, C')
            h = jnp.max(
                jnp.where(nvalid[..., None], gathered, -big), axis=2
            )
            h = jnp.where(pm[..., None], h, 0.0)
            coord, mask, sig_rest = pc, pm, sig_down

        # decoder: linear1(skip) + 3-NN IDW interp of linear2(coarse)
        for s in reversed(range(num_stages - 1)):
            skip_coord, skip_feat, skip_mask = skips[s]
            c_out = self.channels[s]
            up = interpolation(
                coord, skip_coord,
                nn.Dense(c_out, name=f"up{s}_linear2")(
                    nn.LayerNorm(name=f"up{s}_norm2")(h)
                ),
                mask, skip_mask, k=self.up_k,
            )
            h = up + nn.Dense(c_out, name=f"up{s}_linear1")(
                nn.LayerNorm(name=f"up{s}_norm1")(skip_feat)
            )
            coord, mask = skip_coord, skip_mask

        if self.num_classes > 0:
            # classifier: Linear-BN-ReLU-Linear (swin3d_v1m1_base.py:108-113)
            g = nn.Dense(self.channels[0])(h)
            g = nn.relu(PointBatchNorm(self.channels[0])(g, mask, ura))
            h = nn.Dense(self.num_classes)(g)
        return h
