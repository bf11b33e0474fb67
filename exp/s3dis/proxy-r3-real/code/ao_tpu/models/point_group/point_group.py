"""PointGroup instance segmentation
(reference: pointcept/models/point_group/point_group_v1m1_base.py:19-180).

Backbone features feed a semantic head and a per-point center-offset
("bias") head; the training loss is CE + L1 + cosine on the offsets. At
inference, points are shifted by their predicted offsets and clustered by
the native BFS connected-components library (ao_tpu.ops.cluster — the
reference's pointgroup_ops ballquery+bfs pair); proposals below the point
threshold are dropped and scored by mean semantic confidence.

The dense per-point compute is a flax module (jit/TPU); clustering runs on
host between jitted calls, exactly as the reference splits GPU ball query
and CPU BFS.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ao_tpu.models.builder import MODELS
from ao_tpu.models.utils import PointBatchNorm


@MODELS.register_module("PG-v1m1")
class PointGroup(nn.Module):
    backbone: Any = None
    backbone_out_channels: int = 96
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Tuple[int, ...] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    cluster_closed_points: int = 300
    cluster_propose_points: int = 100
    cluster_min_points: int = 50
    voxel_size: float = 0.02

    @nn.compact
    def __call__(self, coord, feat, mask, deterministic: bool = True,
                 use_running_average: bool = False):
        """Returns (seg_logits (B, N, C), bias_pred (B, N, 3))."""
        ura = use_running_average
        h = self.backbone(coord, feat, mask, deterministic, ura)
        C = self.backbone_out_channels
        b = nn.Dense(C, name="bias_fc1")(h)
        b = PointBatchNorm(C, momentum=0.01, eps=1e-3, name="bias_bn")(
            b, mask, ura
        )
        b = nn.relu(b)
        bias_pred = nn.Dense(3, name="bias_fc2")(b)
        seg_logits = nn.Dense(self.semantic_num_classes, name="seg_head")(h)
        return seg_logits, bias_pred


def point_group_loss(seg_logits, bias_pred, coord, segment, instance,
                     instance_center, mask, ignore_index=-1,
                     instance_ignore_index=-1):
    """CE + offset L1 + offset cosine (reference :78-98). jit-friendly."""
    from ao_tpu.models.losses.misc import CrossEntropyLoss

    seg_loss = CrossEntropyLoss(ignore_index=ignore_index)(
        seg_logits, segment, mask
    )
    m = ((instance != instance_ignore_index) & mask).astype(jnp.float32)
    bias_gt = instance_center - coord
    l1 = jnp.sum(jnp.abs(bias_pred - bias_gt), axis=-1)
    bias_l1_loss = jnp.sum(l1 * m) / (jnp.sum(m) + 1e-8)
    pn = bias_pred / (
        jnp.linalg.norm(bias_pred, axis=-1, keepdims=True) + 1e-8
    )
    gn = bias_gt / (jnp.linalg.norm(bias_gt, axis=-1, keepdims=True) + 1e-8)
    cos = -jnp.sum(pn * gn, axis=-1)
    bias_cos_loss = jnp.sum(cos * m) / (jnp.sum(m) + 1e-8)
    return {
        "loss": seg_loss + bias_l1_loss + bias_cos_loss,
        "seg_loss": seg_loss,
        "bias_l1_loss": bias_l1_loss,
        "bias_cosine_loss": bias_cos_loss,
    }


def propose_instances(
    seg_logits: np.ndarray,  # (N, C) host
    bias_pred: np.ndarray,  # (N, 3)
    coord: np.ndarray,  # (N, 3)
    segment_ignore_index=(-1, 0, 1),
    cluster_thresh: float = 1.5,
    cluster_min_points: int = 50,
    cluster_propose_points: int = 100,
    voxel_size: float = 0.02,
):
    """Host-side proposal generation (reference :103-177). Returns dict of
    pred_masks (P, N) uint8, pred_classes (P,), pred_scores (P,)."""
    from scipy.special import softmax

    from ao_tpu.ops.cluster import bfs_cluster

    probs = softmax(seg_logits, axis=-1)
    segment_pred = probs.argmax(-1)
    keep = ~np.isin(segment_pred, segment_ignore_index)
    n = coord.shape[0]
    if keep.sum() == 0:
        return dict(
            pred_masks=np.zeros((0, n), np.uint8),
            pred_classes=np.zeros(0, np.int64),
            pred_scores=np.zeros(0, np.float32),
        )
    center_pred = (coord + bias_pred) / voxel_size
    semantic = np.where(keep, segment_pred, -1).astype(np.int32)
    labels, n_clusters = bfs_cluster(
        center_pred.astype(np.float32), semantic,
        radius=cluster_thresh, min_points=cluster_min_points,
    )
    masks, classes, scores = [], [], []
    for cid in range(n_clusters):
        members = labels == cid
        if members.sum() <= cluster_propose_points:
            continue
        cls = segment_pred[members][0]
        masks.append(members.astype(np.uint8))
        classes.append(cls)
        scores.append(float(probs[members, cls].mean()))
    if not masks:
        return dict(
            pred_masks=np.zeros((0, n), np.uint8),
            pred_classes=np.zeros(0, np.int64),
            pred_scores=np.zeros(0, np.float32),
        )
    return dict(
        pred_masks=np.stack(masks),
        pred_classes=np.asarray(classes, np.int64),
        pred_scores=np.asarray(scores, np.float32),
    )
