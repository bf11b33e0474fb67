"""Masked Scene Contrast (MSC) pretraining.

TPU-native re-implementation of the reference MSC-v1m1
(reference: pointcept/models/masked_scene_contrast/
masked_scene_contrast_v1m1_base.py:24-300): two augmented views of a scene
are patch-masked with complementary masks, encoded by a shared backbone,
and trained with (a) an InfoNCE loss over radius-matched cross-view point
pairs and (b) MSE color/normal reconstruction at masked points.

Fixed-shape translation notes:
* cross masks: instead of permuting the dynamic patch list, each 0.1 m
  patch of the union cloud draws an iid uniform tag from a hash of its
  grid key and the step seed; tag < mask_rate masks view1, the next
  mask_rate band masks view2 — same marginal masking distribution, jit
  static.
* pair matching: k-NN from view1 to view2 (radius-filtered), one random
  in-radius neighbour per query, then a random subset capped at
  ``matching_max_pair`` with a validity mask (pad rows carry zero loss).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.ops import knn


def _hash_uniform(key: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Deterministic uniform [0,1) per int32 key (splitmix-style)."""
    x = (key.astype(jnp.uint32) + seed.astype(jnp.uint32)) * jnp.uint32(
        0x9E3779B9
    )
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) / jnp.float32(2**32)


def _patch_tag(origin_coord, mask, grid_size, seed):
    """Uniform tag per mask-grid patch (B, N)."""
    big = np.float32(1e30)
    lo = jnp.min(jnp.where(mask[..., None], origin_coord, big), axis=1)
    d = jnp.floor((origin_coord - lo[:, None, :]) / grid_size).astype(jnp.int32)
    d = jnp.where(mask[..., None], d, 0)
    key = (d[..., 0] * 19349663 + d[..., 1] * 83492791) ^ (d[..., 2] * 73856093)
    return _hash_uniform(key, seed)


@MODELS.register_module("MSC-v1m1")
class MaskedSceneContrast(nn.Module):
    backbone: Any = None
    backbone_in_channels: int = 6
    backbone_out_channels: int = 96
    mask_grid_size: float = 0.1
    mask_rate: float = 0.4
    matching_max_k: int = 8
    matching_max_radius: float = 0.03
    matching_max_pair: int = 8192
    nce_t: float = 0.4
    contrast_weight: float = 1.0
    reconstruct_weight: float = 1.0
    reconstruct_color: bool = True
    reconstruct_normal: bool = True
    # CSC (MSC-v1m2, reference masked_scene_contrast_v1m2_csc.py:25-265):
    # partition-aware InfoNCE — negatives are restricted to the spatial
    # partition of each pair (near/far x up/down of the relative offset,
    # thresholds r1/r2); pairs closer than r1 fall in no partition.
    csc: bool = False
    partitions: int = 4
    r1: float = 0.125
    r2: float = 2.0

    @nn.compact
    def __call__(
        self,
        view1_origin_coord, view1_coord, view1_feat, view1_mask,
        view2_origin_coord, view2_coord, view2_feat, view2_mask,
        view1_color=None, view1_normal=None,
        view2_color=None, view2_normal=None,
        deterministic: bool = False,
        use_running_average: bool = False,
    ):
        ura = use_running_average
        seed = (
            jax.random.randint(
                self.make_rng("mask"), (), 0, np.iinfo(np.int32).max
            )
            if not deterministic
            else jnp.int32(0)
        )
        # complementary cross masks over the union origin coords
        tag1 = _patch_tag(view1_origin_coord, view1_mask, self.mask_grid_size, seed)
        tag2 = _patch_tag(view2_origin_coord, view2_mask, self.mask_grid_size, seed)
        m1 = (tag1 < self.mask_rate) & view1_mask
        m2 = (
            (tag2 >= self.mask_rate) & (tag2 < 2 * self.mask_rate) & view2_mask
        )

        mask_token = self.param(
            "mask_token",
            nn.initializers.truncated_normal(0.02),
            (1, self.backbone_in_channels),
        )
        f1 = jnp.where(m1[..., None], mask_token, view1_feat)
        f2 = jnp.where(m2[..., None], mask_token, view2_feat)

        feat1 = self.backbone(view1_coord, f1, view1_mask, deterministic, ura)
        feat2 = self.backbone(view2_coord, f2, view2_mask, deterministic, ura)

        # radius-filtered cross-view pairs (kNN on origin coords)
        idx, dist, valid = knn(
            view1_origin_coord, view2_origin_coord, self.matching_max_k,
            view1_mask, view2_mask,
        )
        in_radius = valid & (dist < self.matching_max_radius)
        rng_sel = (
            self.make_rng("mask") if not deterministic else jax.random.PRNGKey(0)
        )
        r = jax.random.uniform(rng_sel, in_radius.shape)
        pick = jnp.argmax(jnp.where(in_radius, r, -1.0), axis=-1)  # (B, N)
        picked_idx = jnp.take_along_axis(idx, pick[..., None], axis=-1)[..., 0]
        row_valid = jnp.any(in_radius, axis=-1)
        # random subset of rows capped at matching_max_pair (per batch elem)
        P = min(self.matching_max_pair, view1_coord.shape[1])
        score = jnp.where(
            row_valid, jax.random.uniform(rng_sel, row_valid.shape), -1.0
        )
        _, rows = jax.lax.top_k(score, P)  # (B, P)
        pair_valid = jnp.take_along_axis(row_valid, rows, axis=1)
        v2_rows = jnp.take_along_axis(picked_idx, rows, axis=1)

        z1 = jnp.take_along_axis(feat1, rows[..., None], axis=1)
        z2 = jnp.take_along_axis(feat2, v2_rows[..., None], axis=1)
        z1 = z1 / (jnp.linalg.norm(z1, axis=-1, keepdims=True) + 1e-7)
        z2 = z2 / (jnp.linalg.norm(z2, axis=-1, keepdims=True) + 1e-7)
        sim = jnp.einsum("bpc,bqc->bpq", z1, z2) / self.nce_t  # (B, P, P)
        neg_mask = pair_valid[:, None, :]

        def _masked_nce(extra_mask=None):
            m = neg_mask if extra_mask is None else neg_mask & extra_mask
            s = jnp.where(m, sim, -1e9)
            logp = jax.nn.log_softmax(s, axis=-1)
            diag = jnp.diagonal(logp, axis1=1, axis2=2)
            return -jnp.sum(jnp.where(pair_valid, diag, 0.0)) / jnp.maximum(
                jnp.sum(pair_valid), 1.0
            )

        if self.csc:
            # CSC partition-aware InfoNCE: per spatial partition of the
            # picked pair coords, negatives restricted to the partition
            # (diagonal always in; reference compute_partitions /
            # compute_contrastive_loss, v1m2_csc.py:182-265)
            c1 = jnp.take_along_axis(view1_coord, rows[..., None], axis=1)
            c2 = jnp.take_along_axis(view2_coord, v2_rows[..., None], axis=1)
            rel = c2[:, None, :, :] - c1[:, :, None, :]  # (B, P, P, 3)
            d = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-7)
            upper = rel[..., 2] > 0.0
            lower = rel[..., 2] < 0.0
            near = (d > self.r1) & (d <= self.r2)
            far = d > self.r2
            eye = jnp.eye(P, dtype=bool)[None]
            parts = [near & upper, near & lower, far & upper, far & lower]
            # Pairs with d <= r1 (and exact z ties) stay at the reference's
            # -1e7 init and form a fifth partition that `part.unique()`
            # iterates over (v1m2_csc.py:182-200,244) — these are the
            # nearest, hardest negatives. Normalisation stays /partitions
            # (=4) as in the reference (`loss /= len(offset)*partitions`).
            rest = ~(parts[0] | parts[1] | parts[2] | parts[3])
            parts.append(rest)
            nce = 0.0
            for pm in parts:
                nce = nce + _masked_nce(pm | eye)
            nce = nce / 4.0
        else:
            nce = _masked_nce()
        pos_sim = jnp.sum(
            jnp.where(pair_valid, jnp.diagonal(sim, axis1=1, axis2=2), 0.0)
        ) / jnp.maximum(jnp.sum(pair_valid), 1.0) * self.nce_t

        loss = nce * self.contrast_weight
        out = dict(nce_loss=nce, pos_sim=pos_sim)

        if self.reconstruct_color and view1_color is not None:
            head = nn.Dense(3, name="color_head")
            c1, c2 = head(feat1), head(feat2)
            se = jnp.sum(
                jnp.where(m1[..., None], (c1 - view1_color) ** 2, 0.0)
            ) + jnp.sum(jnp.where(m2[..., None], (c2 - view2_color) ** 2, 0.0))
            denom = jnp.maximum(jnp.sum(m1) + jnp.sum(m2), 1.0)
            color_loss = se / denom
            loss = loss + color_loss * self.reconstruct_weight
            out["color_loss"] = color_loss
        if self.reconstruct_normal and view1_normal is not None:
            head = nn.Dense(3, name="normal_head")
            n1, n2 = head(feat1), head(feat2)
            se = jnp.sum(
                jnp.where(m1[..., None], (n1 - view1_normal) ** 2, 0.0)
            ) + jnp.sum(jnp.where(m2[..., None], (n2 - view2_normal) ** 2, 0.0))
            denom = jnp.maximum(jnp.sum(m1) + jnp.sum(m2), 1.0)
            normal_loss = se / denom
            loss = loss + normal_loss * self.reconstruct_weight
            out["normal_loss"] = normal_loss

        out["loss"] = loss
        return out


def _msc_v1m2(**kwargs):
    """MSC-v1m2: MSC with CSC partition-aware InfoNCE (reference
    masked_scene_contrast_v1m2_csc.py:25)."""
    kwargs.setdefault("csc", True)
    return MaskedSceneContrast(**kwargs)


MODELS.register_module(name="MSC-v1m2", module=_msc_v1m2)
