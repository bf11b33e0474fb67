"""Swin3D — shifted-window transformer on sparse voxels.

TPU-native re-implementation of the reference Swin3D-v1m1
(reference: pointcept/models/swin3d/swin3d_v1m1_base.py, backed by
MinkowskiEngine sparse tensors): a sparse-conv stem followed by stages of
shifted-window attention over voxels with grid-pool downsampling. The
window machinery is shared with the stratified transformer
(ops/window_partition.py) — windows here are ``window_size`` voxels wide
in discrete-coordinate space; relative position bias uses the same
quantised-table scheme. Decoder is skip-fused interpolation upsampling.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm
from ao_tpu.ops import grid_pool
from ao_tpu.ops.interpolation import interpolation
from ao_tpu.ops.sparse_conv import build_table, kernel_offsets, neighbor_idx, \
    sparse_conv_apply


@MODELS.register_module("Swin3D-v1m1")
class Swin3D(nn.Module):
    in_channels: int
    num_classes: int
    base_grid_size: float = 0.02
    channels: Tuple[int, ...] = (48, 96, 192, 384, 384)
    num_heads: Tuple[int, ...] = (6, 6, 12, 24, 24)
    depths: Tuple[int, ...] = (2, 4, 9, 4, 4)
    window_sizes: Tuple[int, ...] = (5, 7, 7, 7, 7)  # in voxels per stage
    quant_size: float = 0.25
    drop_path_rate: float = 0.3
    stage_cap_ratios: Tuple[float, ...] = (0.4, 0.4, 0.4, 0.4)

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        from ao_tpu.models.stratified_transformer.stratified import STBlock

        ura = use_running_average
        num_stages = len(self.channels)
        dp = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # sparse-conv stem on the voxelised input
        lo = jnp.min(
            jnp.where(mask[..., None], coord, np.float32(1e30)), axis=1
        )
        dc = jnp.floor(
            (coord - lo[:, None, :]) / self.base_grid_size
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
        grid = self.base_grid_size
        for s in range(num_stages):
            if s > 0:
                cap = max(int(cap * self.stage_cap_ratios[s - 1]), 64)
                grid = grid * 2
                pc, pf, pm, _, _ = grid_pool(
                    coord, nn.Dense(self.channels[s], name=f"down{s}")(h),
                    mask, grid, cap,
                )
                skips.append((coord, h, mask))
                coord, h, mask = pc, pf, pm
            num_windows = max(int(coord.shape[1] * 0.25), 16)
            win = self.window_sizes[s] * grid
            for d in range(self.depths[s]):
                h = STBlock(
                    channels=self.channels[s],
                    num_heads=self.num_heads[s],
                    window_size=win,
                    quant_size=self.quant_size * grid,
                    shift=(d % 2 == 1),
                    stratified_grid=0.0,  # plain Swin windows
                    window_capacity=max(self.window_sizes[s] ** 2, 49),
                    drop_path=float(dp[bi]),
                    name=f"stage{s}_block{d}",
                )(coord, h, mask, num_windows, deterministic)
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
