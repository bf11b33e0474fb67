"""Segment Anything Model (SAM) in flax — TPU-native inference stack.

The reference depends on the external torch ``segment_anything`` package
for PP2S preprocessing and the REAL refinement loop (reference:
pointcept/utils/my_run_sam_final.py:10, engines/train_sam_real.py:44).
This is a fresh flax implementation of the same architecture — ViT
image encoder with decomposed relative-position windowed attention,
positional prompt encoder, and the two-way-transformer mask decoder —
structured to mirror the HuggingFace ``SamModel`` module tree so torch
checkpoints convert mechanically (see convert.py; numerical parity is
tested against the torch implementation at a tiny config in
tests/test_sam.py). Convs run NHWC (TPU-native layout).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    hidden_size: int = 1280  # ViT-H
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 1024
    patch_size: int = 16
    num_channels: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    output_channels: int = 256
    layer_norm_eps: float = 1e-6
    num_pos_feats: int = 128


@dataclasses.dataclass(frozen=True)
class SamPromptEncoderConfig:
    hidden_size: int = 256
    image_embedding_size: int = 64
    input_image_size: int = 1024
    mask_input_channels: int = 16
    num_point_embeddings: int = 4
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SamMaskDecoderConfig:
    hidden_size: int = 256
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision: SamVisionConfig = SamVisionConfig()
    prompt: SamPromptEncoderConfig = SamPromptEncoderConfig()
    decoder: SamMaskDecoderConfig = SamMaskDecoderConfig()

    @staticmethod
    def vit_h():
        return SamConfig()

    @staticmethod
    def vit_l():
        return SamConfig(
            vision=SamVisionConfig(
                hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                global_attn_indexes=(5, 11, 17, 23),
            )
        )

    @staticmethod
    def vit_b():
        return SamConfig(
            vision=SamVisionConfig(
                hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                global_attn_indexes=(2, 5, 8, 11),
            )
        )

    @staticmethod
    def tiny():
        """Small config for tests."""
        return SamConfig(
            vision=SamVisionConfig(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                image_size=64, patch_size=8, window_size=2,
                global_attn_indexes=(1,), output_channels=16, num_pos_feats=8,
            ),
            prompt=SamPromptEncoderConfig(
                hidden_size=16, image_embedding_size=8, input_image_size=64,
                mask_input_channels=8,
            ),
            decoder=SamMaskDecoderConfig(
                hidden_size=16, num_attention_heads=2, mlp_dim=32,
                iou_head_hidden_dim=16,
            ),
        )


# --------------------------------------------------------------------------
# Vision encoder
# --------------------------------------------------------------------------
class MLPBlock(nn.Module):
    hidden_size: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.hidden_size, name="lin2")(x)


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interpolate relative positional embeddings for q/k sizes."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int32)]


class VisionAttention(nn.Module):
    config: SamVisionConfig
    window_size: int

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, H, W, _ = x.shape
        nh = cfg.num_attention_heads
        head_dim = cfg.hidden_size // nh
        scale = head_dim**-0.5

        qkv = nn.Dense(cfg.hidden_size * 3, use_bias=cfg.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        qkv = qkv.reshape(3, B * nh, H * W, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = (q * scale) @ k.transpose(0, 2, 1)  # (B*nh, HW, HW)

        if cfg.use_rel_pos:
            size = (
                self.window_size
                if self.window_size > 0
                else cfg.image_size // cfg.patch_size
            )
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * size - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * size - 1, head_dim)
            )
            rh = _get_rel_pos(H, H, rel_pos_h)  # (H, H, hd)
            rw = _get_rel_pos(W, W, rel_pos_w)
            rq = q.reshape(B * nh, H, W, head_dim)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
            attn = attn + (
                rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
            ).reshape(B * nh, H * W, H * W)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = (attn @ v).reshape(B, nh, H, W, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, -1)
        return nn.Dense(cfg.hidden_size, name="proj")(out)


def window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(
        B, Hp // window_size, window_size, Wp // window_size, window_size, C
    )
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size, padded, original):
    Hp, Wp = padded
    H, W = original
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class VisionLayer(nn.Module):
    config: SamVisionConfig
    window_size: int

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, padded = window_partition(x, self.window_size)
        x = VisionAttention(cfg, self.window_size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, padded, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        y = MLPBlock(cfg.hidden_size, int(cfg.hidden_size * cfg.mlp_ratio),
                     name="mlp")(y)
        return x + y


class VisionNeck(nn.Module):
    config: SamVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.output_channels, (1, 1), use_bias=False, name="conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        x = nn.Conv(
            cfg.output_channels, (3, 3), padding=1, use_bias=False, name="conv2"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        return x


class VisionEncoder(nn.Module):
    config: SamVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) normalised. Returns (B, h, w, C_out)."""
        cfg = self.config
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            name="patch_embed",
        )(pixel_values)
        if cfg.use_abs_pos:
            grid = cfg.image_size // cfg.patch_size
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros,
                (1, grid, grid, cfg.hidden_size),
            )
            x = x + pos_embed
        for i in range(cfg.num_hidden_layers):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = VisionLayer(cfg, ws, name=f"layers_{i}")(x)
        return VisionNeck(cfg, name="neck")(x)


# --------------------------------------------------------------------------
# Prompt encoder
# --------------------------------------------------------------------------
class PositionalEmbedding(nn.Module):
    """Random-Fourier positional encoding of [0,1]^2 coords."""

    num_pos_feats: int
    scale_init: float = 1.0

    @nn.compact
    def __call__(self, coords):
        pe = self.param(
            "positional_embedding",
            lambda key, shape: self.scale_init * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        coords = 2 * coords - 1
        coords = coords @ pe
        coords = 2 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


class MaskEmbedding(nn.Module):
    config: SamPromptEncoderConfig

    @nn.compact
    def __call__(self, masks):
        """masks: (B, H, W, 1)."""
        c = self.config.mask_input_channels // 4
        x = nn.Conv(c, (2, 2), strides=(2, 2), name="conv1")(masks)
        x = nn.LayerNorm(epsilon=self.config.layer_norm_eps, name="layer_norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.config.mask_input_channels, (2, 2), strides=(2, 2), name="conv2"
        )(x)
        x = nn.LayerNorm(epsilon=self.config.layer_norm_eps, name="layer_norm2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.config.hidden_size, (1, 1), name="conv3")(x)


class PromptEncoder(nn.Module):
    config: SamPromptEncoderConfig
    num_pos_feats: int

    def setup(self):
        cfg = self.config
        self.shared_embedding = PositionalEmbedding(
            self.num_pos_feats, name="shared_embedding"
        )
        self.mask_embed = MaskEmbedding(cfg, name="mask_embed")
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, cfg.hidden_size)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, cfg.hidden_size)
        )
        self.point_embed = [
            self.param(
                f"point_embed_{i}", nn.initializers.normal(1.0),
                (1, cfg.hidden_size),
            )
            for i in range(cfg.num_point_embeddings)
        ]

    def _embed_points(self, points, labels, pad: bool):
        cfg = self.config
        points = points + 0.5  # pixel centers
        if pad:
            pad_pt = jnp.zeros(points.shape[:2] + (1, 2), points.dtype)
            pad_lb = -jnp.ones(labels.shape[:2] + (1,), labels.dtype)
            points = jnp.concatenate([points, pad_pt], axis=2)
            labels = jnp.concatenate([labels, pad_lb], axis=2)
        coords = points / cfg.input_image_size
        pe = self.shared_embedding(coords)
        pe = jnp.where(labels[..., None] == -1, self.not_a_point_embed, pe)
        pe = jnp.where(
            (labels == 0)[..., None], pe + self.point_embed[0][None, None], pe
        )
        pe = jnp.where(
            (labels == 1)[..., None], pe + self.point_embed[1][None, None], pe
        )
        return pe

    def _embed_boxes(self, boxes):
        cfg = self.config
        boxes = boxes + 0.5
        B, nb = boxes.shape[:2]
        coords = boxes.reshape(B, nb, 2, 2) / cfg.input_image_size
        ce = self.shared_embedding(coords)
        ce = ce.at[:, :, 0, :].add(self.point_embed[2][0])
        ce = ce.at[:, :, 1, :].add(self.point_embed[3][0])
        return ce

    def __call__(self, input_points=None, input_labels=None, input_boxes=None,
                 input_masks=None):
        """points: (B, P, n, 2); labels: (B, P, n); boxes: (B, nb, 4);
        masks: (B, H, W, 1). Returns (sparse (B, P, t, C), dense (B, s, s, C))."""
        cfg = self.config
        sparse = None
        batch = 1
        if input_points is not None:
            batch = input_points.shape[0]
            sparse = self._embed_points(
                input_points, input_labels, pad=(input_boxes is None)
            )
        if input_boxes is not None:
            batch = input_boxes.shape[0]
            be = self._embed_boxes(input_boxes)
            sparse = be if sparse is None else jnp.concatenate([sparse, be], 2)
        if input_masks is not None:
            dense = self.mask_embed(input_masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1),
                (batch, cfg.image_embedding_size, cfg.image_embedding_size,
                 cfg.hidden_size),
            )
        return sparse, dense


# --------------------------------------------------------------------------
# Mask decoder
# --------------------------------------------------------------------------
class DecoderAttention(nn.Module):
    config: SamMaskDecoderConfig
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, query, key, value):
        cfg = self.config
        internal = cfg.hidden_size // self.downsample_rate
        nh = cfg.num_attention_heads
        hd = internal // nh
        q = nn.Dense(internal, name="q_proj")(query)
        k = nn.Dense(internal, name="k_proj")(key)
        v = nn.Dense(internal, name="v_proj")(value)
        B, P = q.shape[0], q.shape[1]

        def split(x):
            return x.reshape(B * P, x.shape[2], nh, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = attn @ v  # (B*P, nh, t, hd)
        out = out.transpose(0, 2, 1, 3).reshape(B, P, -1, internal)
        return nn.Dense(cfg.hidden_size, name="out_proj")(out)


class _TwoWayAttentionBlock(nn.Module):
    config: SamMaskDecoderConfig
    skip_first_layer_pe: bool = False

    def setup(self):
        cfg = self.config
        eps = cfg.layer_norm_eps
        self.self_attn = DecoderAttention(cfg, 1, name="self_attn")
        self.layer_norm1 = nn.LayerNorm(epsilon=eps, name="layer_norm1")
        self.cross_attn_token_to_image = DecoderAttention(
            cfg, cfg.attention_downsample_rate, name="cross_attn_token_to_image"
        )
        self.layer_norm2 = nn.LayerNorm(epsilon=eps, name="layer_norm2")
        self.mlp = MLPBlock(cfg.hidden_size, cfg.mlp_dim, name="mlp")
        self.layer_norm3 = nn.LayerNorm(epsilon=eps, name="layer_norm3")
        self.layer_norm4 = nn.LayerNorm(epsilon=eps, name="layer_norm4")
        self.cross_attn_image_to_token = DecoderAttention(
            cfg, cfg.attention_downsample_rate, name="cross_attn_image_to_token"
        )

    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.layer_norm1(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.layer_norm2(queries)

        queries = queries + self.mlp(queries)
        queries = self.layer_norm3(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.layer_norm4(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    config: SamMaskDecoderConfig

    @nn.compact
    def __call__(self, point_embeddings, image_embeddings, image_pe):
        """point_embeddings (B, P, t, C); image_embeddings (B, h, w, C);
        image_pe (B, h, w, C)."""
        cfg = self.config
        B, h, w, C = image_embeddings.shape
        keys = image_embeddings.reshape(B, 1, h * w, C)
        key_pe = image_pe.reshape(B, 1, h * w, C)
        P = point_embeddings.shape[1]
        keys = jnp.broadcast_to(keys, (B, P, h * w, C))
        key_pe = jnp.broadcast_to(key_pe, (B, P, h * w, C))

        queries = point_embeddings
        for i in range(cfg.num_hidden_layers):
            queries, keys = _TwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, point_embeddings, key_pe)
        q = queries + point_embeddings
        k = keys + key_pe
        queries = queries + DecoderAttention(
            cfg, cfg.attention_downsample_rate, name="final_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(name="layer_norm_final_attn")(queries)
        return queries, keys


class FeedForward(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, name="proj_in")(x)
        x = nn.relu(x)
        for i in range(self.num_layers - 2):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, name="proj_out")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    config: SamMaskDecoderConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool = True):
        """image_embeddings (B, h, w, C); image_pe (B, h, w, C);
        sparse (B, P, t, C); dense (B, h, w, C).
        Returns (masks (B, P, m, 4h, 4w), iou_pred (B, P, m))."""
        cfg = self.config
        num_mask_tokens = cfg.num_multimask_outputs + 1
        B, h, w, C = image_embeddings.shape
        P = sparse_prompt_embeddings.shape[1]

        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, cfg.hidden_size)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (num_mask_tokens, cfg.hidden_size),
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None, None], (B, P, output_tokens.shape[0], C)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=2)

        src = image_embeddings + dense_prompt_embeddings
        point_embedding, keys = TwoWayTransformer(cfg, name="transformer")(
            tokens, src, image_pe
        )
        iou_token_out = point_embedding[:, :, 0, :]
        mask_tokens_out = point_embedding[:, :, 1 : 1 + num_mask_tokens, :]

        # upscale image embeddings 4x
        img = keys.reshape(B * P, h, w, C)
        up = nn.ConvTranspose(
            cfg.hidden_size // 4, (2, 2), strides=(2, 2), name="upscale_conv1"
        )(img)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_layer_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            cfg.hidden_size // 8, (2, 2), strides=(2, 2), name="upscale_conv2"
        )(up)
        up = nn.gelu(up, approximate=False)  # (B*P, 4h, 4w, C/8)

        hyper = []
        for i in range(num_mask_tokens):
            hyper.append(
                FeedForward(
                    cfg.hidden_size, cfg.hidden_size // 8, 3,
                    name=f"output_hypernetworks_mlps_{i}",
                )(mask_tokens_out[:, :, i, :])
            )
        hyper_in = jnp.stack(hyper, axis=2)  # (B, P, m, C/8)

        up = up.reshape(B, P, -1, cfg.hidden_size // 8)  # (B, P, 4h*4w, C/8)
        masks = jnp.einsum("bpmc,bpnc->bpmn", hyper_in, up)
        masks = masks.reshape(B, P, num_mask_tokens, h * 4, w * 4)

        iou_pred = FeedForward(
            cfg.iou_head_hidden_dim, num_mask_tokens, cfg.iou_head_depth,
            name="iou_prediction_head",
        )(iou_token_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou_pred[:, :, sl]


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------
class SamModel(nn.Module):
    config: SamConfig

    def setup(self):
        cfg = self.config
        self.shared_image_embedding = PositionalEmbedding(
            cfg.vision.num_pos_feats, name="shared_image_embedding"
        )
        self.vision_encoder = VisionEncoder(cfg.vision, name="vision_encoder")
        self.prompt_encoder = PromptEncoder(
            cfg.prompt, cfg.vision.num_pos_feats, name="prompt_encoder"
        )
        self.mask_decoder = MaskDecoder(cfg.decoder, name="mask_decoder")

    def get_image_embeddings(self, pixel_values):
        """pixel_values (B, H, W, 3) -> (B, s, s, C)."""
        return self.vision_encoder(pixel_values)

    def get_image_wide_pe(self):
        s = self.config.prompt.image_embedding_size
        grid = np.ones((s, s), np.float32)
        y = (grid.cumsum(0) - 0.5) / s
        x = (grid.cumsum(1) - 0.5) / s
        coords = jnp.asarray(np.stack([x, y], axis=-1))
        return self.shared_image_embedding(coords)[None]  # (1, s, s, C)

    def predict_masks(self, image_embeddings, input_points, input_labels,
                      input_masks=None, multimask_output: bool = True):
        """image_embeddings (B, s, s, C); input_points (B, P, n, 2) in input
        image pixel coords (x, y); labels (B, P, n). Returns
        (low_res_masks (B, P, m, 4s, 4s), iou_pred (B, P, m))."""
        sparse, dense = self.prompt_encoder(
            input_points=input_points, input_labels=input_labels,
            input_masks=input_masks,
        )
        image_pe = jnp.broadcast_to(
            self.get_image_wide_pe(), image_embeddings.shape
        )
        return self.mask_decoder(
            image_embeddings, image_pe, sparse, dense, multimask_output
        )

    def __call__(self, pixel_values, input_points, input_labels,
                 multimask_output: bool = True):
        emb = self.get_image_embeddings(pixel_values)
        return self.predict_masks(
            emb, input_points, input_labels, multimask_output=multimask_output
        )
