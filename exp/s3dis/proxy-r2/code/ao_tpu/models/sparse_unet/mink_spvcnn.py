"""MinkUNet variants and SPVCNN on the TPU sparse-conv primitives.

MinkUNet (reference: pointcept/models/sparse_unet/mink_unet.py:159-443,
MinkowskiEngine-backed) shares the SpUNet U-Net topology — stem conv,
four stride-2 encoder stages and four transpose-decoder stages of residual
blocks — differing only in per-variant LAYERS/PLANES; the variants are
registered as configurations of the TPU SpUNet.

SPVCNN (reference: pointcept/models/spvcnn/ts_spvcnn.py:179-436,
torchsparse-backed) adds a point branch fused with the voxel U-Net at
stage boundaries. The framework's inputs are already grid-sampled (voxel
set == point set at full resolution), so the point branch reduces to
per-point MLPs fused by addition at full resolution — the devoxelize step
of torchsparse is the identity here.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm

from .spunet import SpUNet

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


def _register_mink(name, layers, planes):
    def factory(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("channels", planes)
        return SpUNet(**kwargs)

    MODELS.register_module(name=name, module=factory)


for _name, (_layers, _planes) in _MINK_VARIANTS.items():
    _register_mink(_name, _layers, _planes)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    in_channels: int
    out_channels: int
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    stage_cap_ratios: Tuple[float, ...] = (0.5, 0.5, 0.5, 0.5)

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False, discrete_coord=None):
        ura = use_running_average
        # voxel branch: the sparse U-Net
        voxel = SpUNet(
            in_channels=self.in_channels,
            num_classes=0,
            base_channels=self.base_channels,
            channels=self.channels,
            layers=self.layers,
            stage_cap_ratios=self.stage_cap_ratios,
            name="voxel_unet",
        )(coord, feat, mask, deterministic, ura, discrete_coord)
        # point branch: per-point transforms fused with the voxel features
        C = self.channels[-1]
        p = nn.Dense(C, use_bias=False, name="point_fc1")(feat)
        p = PointBatchNorm(C, name="point_bn1")(p, mask, ura)
        p = nn.relu(p)
        h = voxel + p
        p2 = nn.Dense(C, use_bias=False, name="point_fc2")(h)
        p2 = PointBatchNorm(C, name="point_bn2")(p2, mask, ura)
        p2 = nn.relu(p2)
        h = h + p2
        out = nn.Dense(self.out_channels, name="final")(h)
        return jnp.where(mask[..., None], out, 0.0)
