"""SamPredictor-equivalent API on the flax SAM.

Mirrors the torch ``segment_anything.SamPredictor`` contract the reference
uses (reference: engines/train_sam_real.py:167-174 ``set_image`` /
``predict_torch`` on cached embeddings, utils/my_run_sam_final.py:95-98):
``set_image`` embeds a uint8 RGB image once; ``predict`` prompts with
point batches and returns boolean masks at original resolution.
Embeddings can be exported/imported so the REAL loop can cache them on
disk exactly like the reference caches ``predictor.features``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modeling import SamConfig, SamModel

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamPredictor:
    def __init__(self, config: Optional[SamConfig] = None, params=None):
        self.config = config or SamConfig.vit_h()
        self.model = SamModel(self.config)
        self.params = params
        self._features = None
        self._orig_size = None
        self._input_size = None
        self._embed_fn = jax.jit(
            lambda v, x: self.model.apply(
                v, x, method=self.model.get_image_embeddings
            )
        )
        self._predict_fn = jax.jit(
            lambda v, emb, pts, lbl: self.model.apply(
                v, emb, pts, lbl, None, True, method=self.model.predict_masks
            )
        )

    # -- image path --
    def _preprocess(self, image: np.ndarray):
        """uint8 RGB (H, W, 3) -> normalised padded (1, S, S, 3)."""
        S = self.config.vision.image_size
        h, w = image.shape[:2]
        scale = S / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = jnp.asarray(image, jnp.float32)
        img = jax.image.resize(img, (nh, nw, 3), method="linear")
        img = (img - _PIXEL_MEAN) / _PIXEL_STD
        img = jnp.pad(img, ((0, S - nh), (0, S - nw), (0, 0)))
        return img[None], (h, w), (nh, nw)

    def _ensure_params(self):
        """No-checkpoint mode (this environment ships no SAM weights —
        the reference's SAM_ckpt/sam is a placeholder): deterministic
        random init so offline embeddings and in-loop decodes agree."""
        if self.params is None:
            S = self.config.vision.image_size
            self.params = self.model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, S, S, 3)), jnp.zeros((1, 1, 1, 2)),
                jnp.zeros((1, 1, 1), jnp.int32), True,
            )
        return self.params

    def set_image(self, image: np.ndarray):
        self._ensure_params()
        x, self._orig_size, self._input_size = self._preprocess(image)
        self._features = self._embed_fn(self.params, x)
        return self._features

    @property
    def features(self):
        return self._features

    def set_features(self, features, orig_size: Tuple[int, int]):
        """Restore cached embeddings (the REAL loop's disk cache path)."""
        self._features = jnp.asarray(features)
        if self._features.ndim == 3:
            self._features = self._features[None]
        # torch caches are channel-first (1, C, 64, 64)
        if self._features.shape[1] == self.config.vision.output_channels:
            self._features = jnp.transpose(self._features, (0, 2, 3, 1))
        self._orig_size = orig_size
        S = self.config.vision.image_size
        scale = S / max(orig_size)
        self._input_size = (
            int(round(orig_size[0] * scale)),
            int(round(orig_size[1] * scale)),
        )

    def _transform_points(self, coords: np.ndarray) -> np.ndarray:
        """Original-image (x, y) -> model input coords."""
        h, w = self._orig_size
        nh, nw = self._input_size
        coords = np.asarray(coords, np.float32).copy()
        coords[..., 0] *= nw / w
        coords[..., 1] *= nh / h
        return coords

    def predict(
        self,
        point_coords: np.ndarray,  # (P, n, 2) or (n, 2), original (x, y)
        point_labels: np.ndarray,  # (P, n) or (n,)
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Returns (masks (P, m, H, W), iou (P, m), low_res (P, m, s4, s4))."""
        assert self._features is not None, "call set_image/set_features first"
        self._ensure_params()
        point_coords = np.asarray(point_coords, np.float32)
        point_labels = np.asarray(point_labels, np.int32)
        if point_coords.ndim == 2:
            point_coords = point_coords[None]
            point_labels = point_labels[None]
        pts = self._transform_points(point_coords)[None]  # (1, P, n, 2)
        lbl = point_labels[None]
        low_res, iou = self._predict_fn(
            self.params, self._features, jnp.asarray(pts), jnp.asarray(lbl)
        )
        masks = self._postprocess(low_res[0])  # (P, m, H, W)
        if not return_logits:
            masks = masks > 0.0
        return np.asarray(masks), np.asarray(iou[0]), np.asarray(low_res[0])

    def predict_batch(
        self,
        features,  # (F, h, w, C) image embeddings for F frames
        point_coords,  # (F, P, n, 2) original-resolution (x, y)
        point_labels,  # (F, P, n)
        orig_size: Tuple[int, int],
        mask_index: Optional[int] = None,
    ):
        """Decode prompts for F frames in ONE decoder call.

        The mask decoder is batched over its leading axis (modeling.py
        predict_masks: image_embeddings (B, h, w, C) x points
        (B, P, n, 2)), so frames batch for free — the REAL refinement
        loop uses this to amortise dispatch over frames instead of
        calling set_features + predict per frame (SURVEY hard-part #5;
        reference loops frame-by-frame, train_sam_real.py:402-450).

        Returns (masks (F, P, m, H, W) bool, iou (F, P, m)).
        """
        self._ensure_params()
        features = jnp.asarray(features)
        if features.shape[1] == self.config.vision.output_channels:
            features = jnp.transpose(features, (0, 2, 3, 1))
        self._orig_size = orig_size
        S = self.config.vision.image_size
        scale = S / max(orig_size)
        self._input_size = (
            int(round(orig_size[0] * scale)),
            int(round(orig_size[1] * scale)),
        )
        pts = self._transform_points(np.asarray(point_coords, np.float32))
        low_res, iou = self._predict_fn(
            self.params,
            features,
            jnp.asarray(pts),
            jnp.asarray(np.asarray(point_labels, np.int32)),
        )
        if mask_index is not None:
            # only the selected multimask channel is upsampled — the
            # full-resolution (F*P, 3, H, W) f32 resize would dominate
            # the decode batch's memory at REAL prompt counts
            low_res = low_res[:, :, mask_index : mask_index + 1]
        # postprocess frame-by-frame to bound the resize working set
        masks = np.stack(
            [np.asarray(self._postprocess(lr) > 0.0) for lr in low_res]
        )
        return masks, np.asarray(iou)

    def _postprocess(self, low_res_masks):
        """(P, m, s4, s4) logits -> original-resolution (P, m, H, W)."""
        S = self.config.vision.image_size
        nh, nw = self._input_size
        h, w = self._orig_size
        P, m = low_res_masks.shape[:2]
        x = jax.image.resize(low_res_masks, (P, m, S, S), method="linear")
        x = x[:, :, :nh, :nw]
        return jax.image.resize(x, (P, m, h, w), method="linear")
