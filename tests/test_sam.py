"""Numerical parity of the flax SAM vs the torch (HuggingFace) SAM at a
tiny config with randomly initialised weights — validates the architecture
and the checkpoint converter end-to-end without needing SAM weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ao_tpu.models.sam.modeling import SamConfig, SamModel
from ao_tpu.models.sam.convert import (
    convert_hf_state_dict,
    convert_original_checkpoint,
)


@pytest.fixture(scope="module")
def torch_tiny_sam():
    import torch
    from transformers import SamConfig as HFSamConfig
    from transformers import SamModel as HFSamModel
    from transformers.models.sam import configuration_sam as C

    vc = C.SamVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        image_size=64, patch_size=8, global_attn_indexes=[1], window_size=2,
        output_channels=16, num_pos_feats=8, attn_implementation="eager",
    )
    pc = C.SamPromptEncoderConfig(
        hidden_size=16, image_embedding_size=8, image_size=64, patch_size=8,
        mask_input_channels=8,
    )
    mc = C.SamMaskDecoderConfig(
        hidden_size=16, num_attention_heads=2, mlp_dim=32,
        iou_head_hidden_dim=16,
    )
    cfg = HFSamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = HFSamModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_sam(torch_tiny_sam):
    cfg = SamConfig.tiny()
    model = SamModel(cfg)
    sd = {k: v.detach().numpy() for k, v in torch_tiny_sam.state_dict().items()}
    params = convert_hf_state_dict(sd)
    return model, {"params": params}


@pytest.mark.slow
class TestSamParity:
    def test_vision_encoder_matches(self, rng, torch_tiny_sam, flax_sam):
        import torch

        model, variables = flax_sam
        img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = torch_tiny_sam.vision_encoder(torch.from_numpy(img))[0].numpy()
        ours = model.apply(
            variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
            method=model.get_image_embeddings,
        )
        # ref: (B, C, h, w) -> NHWC
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )

    def test_full_mask_prediction_matches(self, rng, torch_tiny_sam, flax_sam):
        import torch

        model, variables = flax_sam
        img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        pts = rng.uniform(5, 60, size=(1, 2, 1, 2)).astype(np.float32)
        lbl = np.ones((1, 2, 1), np.int32)
        with torch.no_grad():
            out = torch_tiny_sam(
                pixel_values=torch.from_numpy(img),
                input_points=torch.from_numpy(pts),
                input_labels=torch.from_numpy(lbl),
                multimask_output=True,
            )
        ref_masks = out.pred_masks.numpy()  # (B, P, m, 4s, 4s)
        ref_iou = out.iou_scores.numpy()
        masks, iou = model.apply(
            variables,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(pts),
            jnp.asarray(lbl),
            True,
        )
        np.testing.assert_allclose(
            np.asarray(iou), ref_iou, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(masks), ref_masks, rtol=1e-2, atol=1e-3
        )

    def test_original_checkpoint_key_conversion(self, torch_tiny_sam, flax_sam):
        """Round-trip the HF state dict through original segment_anything
        naming and check the converter produces the identical tree."""
        model, variables = flax_sam
        sd = {
            k: v.detach().numpy() for k, v in torch_tiny_sam.state_dict().items()
        }
        # build an original-style dict from the HF one
        orig = {}
        import re

        neck_inv = {"conv1": "0", "layer_norm1": "1", "conv2": "2",
                    "layer_norm2": "3"}
        maskdown_inv = {"conv1": "0", "layer_norm1": "1", "conv2": "3",
                        "layer_norm2": "4", "conv3": "6"}
        upscale_inv = {"upscale_conv1": "0", "upscale_layer_norm": "1",
                       "upscale_conv2": "3"}
        for k, v in sd.items():
            if k == "shared_image_embedding.positional_embedding":
                orig[
                    "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
                ] = v
                continue
            if k == "prompt_encoder.shared_embedding.positional_embedding":
                continue  # tied copy, not present in original ckpts
            if k.startswith("vision_encoder."):
                r = k[len("vision_encoder."):]
                r = r.replace("patch_embed.projection.", "patch_embed.proj.")
                r = re.sub(r"^layers\.(\d+)\.", r"blocks.\1.", r)
                r = r.replace(".layer_norm1.", ".norm1.")
                r = r.replace(".layer_norm2.", ".norm2.")
                m = re.match(r"neck\.(\w+)\.(.*)", r)
                if m and m.group(1) in neck_inv:
                    r = f"neck.{neck_inv[m.group(1)]}.{m.group(2)}"
                orig["image_encoder." + r] = v
            elif k.startswith("prompt_encoder."):
                r = k[len("prompt_encoder."):]
                m = re.match(r"point_embed\.(\d)\.weight", r)
                if m:
                    orig[f"prompt_encoder.point_embeddings.{m.group(1)}.weight"] = v
                    continue
                m = re.match(r"mask_embed\.(\w+)\.(.*)", r)
                if m and m.group(1) in maskdown_inv:
                    orig[
                        f"prompt_encoder.mask_downscaling."
                        f"{maskdown_inv[m.group(1)]}.{m.group(2)}"
                    ] = v
                    continue
                orig["prompt_encoder." + r] = v
            elif k.startswith("mask_decoder."):
                r = k[len("mask_decoder."):]
                m = re.match(r"(upscale_\w+)\.(.*)", r)
                if m and m.group(1) in upscale_inv:
                    orig[
                        f"mask_decoder.output_upscaling."
                        f"{upscale_inv[m.group(1)]}.{m.group(2)}"
                    ] = v
                    continue
                m = re.match(r"output_hypernetworks_mlps\.(\d+)\.(\w+)\.(.*)", r)
                if m:
                    key, rest = m.group(2), m.group(3)
                    if key == "layers":
                        j, rest = rest.split(".", 1)
                        mapped = f"layers.{int(j) + 1}"
                    else:
                        mapped = {"proj_in": "layers.0", "proj_out": "layers.2"}[key]
                    orig[
                        f"mask_decoder.output_hypernetworks_mlps.{m.group(1)}."
                        f"{mapped}.{rest}"
                    ] = v
                    continue
                m = re.match(r"iou_prediction_head\.(\w+)\.(.*)", r)
                if m:
                    ff_inv = {"proj_in": "layers.0", "proj_out": "layers.2",
                              "layers": "layers.1"}
                    key = m.group(1)
                    rest = m.group(2)
                    if key == "layers":
                        # HF names middle layers iou_prediction_head.layers.j
                        j, rest2 = rest.split(".", 1)
                        orig[
                            f"mask_decoder.iou_prediction_head.layers."
                            f"{int(j)+1}.{rest2}"
                        ] = v
                    else:
                        orig[
                            f"mask_decoder.iou_prediction_head."
                            f"{ff_inv[key]}.{rest}"
                        ] = v
                    continue
                r = re.sub(
                    r"transformer\.layers\.(\d+)\.layer_norm(\d)\.",
                    r"transformer.layers.\1.norm\2.", r,
                )
                r = r.replace("transformer.layer_norm_final_attn.",
                              "transformer.norm_final_attn.")
                orig["mask_decoder." + r] = v
        converted = convert_original_checkpoint(orig)
        ref = variables["params"]
        flat_a = jax.tree_util.tree_leaves_with_path(converted)
        flat_b = dict(
            jax.tree_util.tree_leaves_with_path(ref)
            and {
                jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(ref)
            }
        )
        for path, v in flat_a:
            key = jax.tree_util.keystr(path)
            assert key in flat_b, f"missing {key}"
            np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[key]))
        assert len(flat_a) == len(flat_b)


class TestPredictor:
    def test_predict_roundtrip(self, rng, torch_tiny_sam, flax_sam):
        from ao_tpu.models.sam import SamConfig
        from ao_tpu.models.sam.predictor import SamPredictor

        model, variables = flax_sam
        pred = SamPredictor(SamConfig.tiny(), variables)
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        pred.set_image(img)
        masks, iou, low_res = pred.predict(
            np.array([[10.0, 20.0]]), np.array([1])
        )
        assert masks.shape == (1, 3, 48, 64)
        assert masks.dtype == bool
        assert iou.shape == (1, 3)

    def test_cached_features_match_set_image(self, rng, flax_sam):
        from ao_tpu.models.sam import SamConfig
        from ao_tpu.models.sam.predictor import SamPredictor

        model, variables = flax_sam
        pred = SamPredictor(SamConfig.tiny(), variables)
        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        feats = pred.set_image(img)
        m1, _, _ = pred.predict(np.array([[30.0, 30.0]]), np.array([1]))
        # torch-style channel-first cache
        cached = np.asarray(feats[0]).transpose(2, 0, 1)[None]
        pred2 = SamPredictor(SamConfig.tiny(), variables)
        pred2.set_features(cached, (64, 64))
        m2, _, _ = pred2.predict(np.array([[30.0, 30.0]]), np.array([1]))
        np.testing.assert_array_equal(m1, m2)
