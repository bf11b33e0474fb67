"""Convert torch SAM checkpoints to the flax SamModel parameter tree.

Two source formats:
* ``convert_hf_state_dict`` — HuggingFace ``SamModel`` state dicts
  (facebook/sam-vit-*); this is also what the tiny-config numerical parity
  test uses (tests/test_sam.py).
* ``convert_original_checkpoint`` — the original ``segment_anything``
  checkpoints (sam_vit_h_4b8939.pth etc.), which is what the reference
  loads (reference: pointcept/utils/my_run_sam_final.py:10); keys are
  first remapped to the HF layout, then converted.

Layout rules: torch Linear (out,in) -> Dense kernel (in,out); torch Conv2d
(out,in,kh,kw) -> flax NHWC kernel (kh,kw,in,out); torch ConvTranspose2d
(in,out,kh,kw) -> flax ConvTranspose kernel (kh,kw,in,out); LayerNorm
weight->scale.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _linear(tree, prefix, key, w):
    if key == "weight":
        _set(tree, prefix + ("kernel",), w.T)
    else:
        _set(tree, prefix + ("bias",), w)


def _conv(tree, prefix, key, w):
    if key == "weight":
        _set(tree, prefix + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
    else:
        _set(tree, prefix + ("bias",), w)


def _conv_t(tree, prefix, key, w):
    if key == "weight":
        # torch ConvTranspose2d: (in, out, kh, kw); flax: (kh, kw, in, out)
        _set(tree, prefix + ("kernel",), np.transpose(w, (2, 3, 0, 1)))
    else:
        _set(tree, prefix + ("bias",), w)


def _ln(tree, prefix, key, w):
    _set(tree, prefix + ("scale" if key == "weight" else "bias",), w)


def convert_hf_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """HF SamModel torch state dict (tensors or numpy) -> flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        if k == "shared_image_embedding.positional_embedding":
            _set(p, ("shared_image_embedding", "positional_embedding"), v)
        elif k == "prompt_encoder.shared_embedding.positional_embedding":
            _set(
                p,
                ("prompt_encoder", "shared_embedding", "positional_embedding"),
                v,
            )
        # ---- vision encoder ----
        elif k.startswith("vision_encoder.patch_embed.projection."):
            _conv(p, ("vision_encoder", "patch_embed"), parts[-1], v)
        elif k == "vision_encoder.pos_embed":
            _set(p, ("vision_encoder", "pos_embed"), v)
        elif k.startswith("vision_encoder.layers."):
            i = parts[2]
            rest = parts[3:]
            base = ("vision_encoder", f"layers_{i}")
            if rest[0] in ("layer_norm1", "layer_norm2"):
                _ln(p, base + (rest[0],), rest[1], v)
            elif rest[0] == "attn":
                if rest[1] in ("qkv", "proj"):
                    _linear(p, base + ("attn", rest[1]), rest[2], v)
                else:  # rel_pos_h / rel_pos_w
                    _set(p, base + ("attn", rest[1]), v)
            elif rest[0] == "mlp":
                _linear(p, base + ("mlp", rest[1]), rest[2], v)
        elif k.startswith("vision_encoder.neck."):
            name = parts[2]
            if name.startswith("conv"):
                _conv(p, ("vision_encoder", "neck", name), parts[3], v)
            else:
                _ln(p, ("vision_encoder", "neck", name), parts[3], v)
        # ---- prompt encoder ----
        elif k.startswith("prompt_encoder.mask_embed."):
            name = parts[2]
            if name.startswith("conv"):
                _conv(p, ("prompt_encoder", "mask_embed", name), parts[3], v)
            else:
                _ln(p, ("prompt_encoder", "mask_embed", name), parts[3], v)
        elif k == "prompt_encoder.no_mask_embed.weight":
            _set(p, ("prompt_encoder", "no_mask_embed"), v)
        elif k == "prompt_encoder.not_a_point_embed.weight":
            _set(p, ("prompt_encoder", "not_a_point_embed"), v)
        elif re.match(r"prompt_encoder\.point_embed\.\d+\.weight", k):
            i = parts[2]
            _set(p, ("prompt_encoder", f"point_embed_{i}"), v)
        # ---- mask decoder ----
        elif k == "mask_decoder.iou_token.weight":
            _set(p, ("mask_decoder", "iou_token"), v)
        elif k == "mask_decoder.mask_tokens.weight":
            _set(p, ("mask_decoder", "mask_tokens"), v)
        elif k.startswith("mask_decoder.transformer.layers."):
            i = parts[3]
            rest = parts[4:]
            base = ("mask_decoder", "transformer", f"layers_{i}")
            if rest[0].startswith("layer_norm"):
                _ln(p, base + (rest[0],), rest[1], v)
            elif rest[0] == "mlp":
                _linear(p, base + ("mlp", rest[1]), rest[2], v)
            else:  # self_attn / cross_attn_* -> {q,k,v,out}_proj
                _linear(p, base + (rest[0], rest[1]), rest[2], v)
        elif k.startswith("mask_decoder.transformer.final_attn_token_to_image."):
            _linear(
                p,
                ("mask_decoder", "transformer", "final_attn_token_to_image",
                 parts[3]),
                parts[4], v,
            )
        elif k.startswith("mask_decoder.transformer.layer_norm_final_attn."):
            _ln(
                p, ("mask_decoder", "transformer", "layer_norm_final_attn"),
                parts[3], v,
            )
        elif k.startswith("mask_decoder.upscale_conv"):
            _conv_t(p, ("mask_decoder", parts[1]), parts[2], v)
        elif k.startswith("mask_decoder.upscale_layer_norm."):
            _ln(p, ("mask_decoder", "upscale_layer_norm"), parts[2], v)
        elif k.startswith("mask_decoder.output_hypernetworks_mlps."):
            i = parts[2]
            if parts[3] == "layers":  # middle layers: layers.N -> layers_N
                sub, key = f"layers_{parts[4]}", parts[5]
            else:
                sub, key = parts[3], parts[4]
            _linear(
                p, ("mask_decoder", f"output_hypernetworks_mlps_{i}", sub),
                key, v,
            )
        elif k.startswith("mask_decoder.iou_prediction_head."):
            if parts[2] == "layers":
                sub, key = f"layers_{parts[3]}", parts[4]
            else:
                sub, key = parts[2], parts[3]
            _linear(p, ("mask_decoder", "iou_prediction_head", sub), key, v)
        # silently skip buffers/aux keys
    return p


# ---- original segment_anything checkpoint -> HF-style keys ----
_ORIG_FF = {"layers.0": "proj_in", "layers.1": "layers_0", "layers.2": "proj_out"}


def _orig_ff(key: str, depth: int = 3) -> str:
    """Map original MLP 'layers.i' to proj_in/layers_j/proj_out."""
    m = re.match(r"layers\.(\d+)\.(.*)", key)
    i, rest = int(m.group(1)), m.group(2)
    if i == 0:
        return f"proj_in.{rest}"
    if i == depth - 1:
        return f"proj_out.{rest}"
    return f"layers_{i-1}.{rest}".replace(f"layers_{i-1}", f"layers.{i-1}")


def convert_original_checkpoint(sd: Dict[str, np.ndarray]) -> dict:
    """Original segment_anything state dict -> flax params (via HF keys)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    hf: Dict[str, np.ndarray] = {}
    neck_map = {"0": "conv1", "1": "layer_norm1", "2": "conv2", "3": "layer_norm2"}
    maskdown_map = {
        "0": "conv1", "1": "layer_norm1", "3": "conv2", "4": "layer_norm2",
        "6": "conv3",
    }
    upscale_map = {"0": "upscale_conv1", "1": "upscale_layer_norm",
                   "3": "upscale_conv2"}
    for k, v in sd.items():
        if k.startswith("image_encoder."):
            r = k[len("image_encoder."):]
            r = r.replace("patch_embed.proj.", "patch_embed.projection.")
            r = re.sub(r"^blocks\.(\d+)\.", r"layers.\1.", r)
            r = r.replace(".norm1.", ".layer_norm1.")
            r = r.replace(".norm2.", ".layer_norm2.")
            m = re.match(r"neck\.(\d)\.(.*)", r)
            if m:
                r = f"neck.{neck_map[m.group(1)]}.{m.group(2)}"
            hf["vision_encoder." + r] = v
        elif k.startswith("prompt_encoder."):
            r = k[len("prompt_encoder."):]
            if r == "pe_layer.positional_encoding_gaussian_matrix":
                # one matrix in the original ckpt; tied into both slots
                hf["shared_image_embedding.positional_embedding"] = v
                hf["prompt_encoder.shared_embedding.positional_embedding"] = v
                continue
            m = re.match(r"point_embeddings\.(\d)\.weight", r)
            if m:
                hf[f"prompt_encoder.point_embed.{m.group(1)}.weight"] = v
                continue
            m = re.match(r"mask_downscaling\.(\d)\.(.*)", r)
            if m:
                hf[
                    f"prompt_encoder.mask_embed.{maskdown_map[m.group(1)]}."
                    f"{m.group(2)}"
                ] = v
                continue
            hf["prompt_encoder." + r] = v
        elif k.startswith("mask_decoder."):
            r = k[len("mask_decoder."):]
            m = re.match(r"output_upscaling\.(\d)\.(.*)", r)
            if m:
                hf[f"mask_decoder.{upscale_map[m.group(1)]}.{m.group(2)}"] = v
                continue
            m = re.match(r"output_hypernetworks_mlps\.(\d+)\.(.*)", r)
            if m:
                hf[
                    f"mask_decoder.output_hypernetworks_mlps.{m.group(1)}."
                    f"{_orig_ff(m.group(2))}"
                ] = v
                continue
            m = re.match(r"iou_prediction_head\.(.*)", r)
            if m:
                hf[f"mask_decoder.iou_prediction_head.{_orig_ff(m.group(1))}"] = v
                continue
            r = re.sub(r"transformer\.layers\.(\d+)\.norm(\d)\.",
                       r"transformer.layers.\1.layer_norm\2.", r)
            r = r.replace("transformer.norm_final_attn.",
                          "transformer.layer_norm_final_attn.")
            hf["mask_decoder." + r] = v
    return convert_hf_state_dict(hf)


def load_sam_checkpoint(path: str) -> dict:
    """Load a torch SAM checkpoint file (original or HF) -> flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    if any(k.startswith("image_encoder.") for k in sd):
        return convert_original_checkpoint(sd)
    return convert_hf_state_dict(sd)
