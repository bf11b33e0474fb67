"""Time ONE scene's REAL refinement at the reference's workload scale.

The proxy REAL loop refines 60 rooms x 14 rendered 512^2 frames; the
reference refines 204 S3DIS rooms x O(30) used 1080^2 captures each
(reference train_sam_real.py:402-450, my_decode_embedding_final.py's
used_imgs selection). This probe synthesises one scene at reference
size — N points, F frames at 1080^2 — runs `_refine_one_scene`
end-to-end (prompt mining -> batched oracle decode -> vote/verify ->
label rewrite) and extrapolates a per-refinement-round wall time for
the 204-room workload at the configured worker count.

Usage: python tools/dev/_real_scale_timing.py [N] [F]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from ao_tpu.engines.train_real import _refine_one_scene
from ao_tpu.models.sam.oracle import OracleSamPredictor
from ao_tpu.pp2s.projection import compute_bridge, splat_raster

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
F = int(sys.argv[2]) if len(sys.argv) > 2 else 30
H = W = 1080
ROOMS = 204
WORKERS = min(8, os.cpu_count() or 1)

rng = np.random.default_rng(0)
root = tempfile.mkdtemp(prefix="real_scale_")
area, room = "Area_1", "office_1"
for sub in ("s3dis", "bridge", "embeddings", "labels"):
    os.makedirs(os.path.join(root, sub, area, room)
                if sub in ("bridge", "embeddings")
                else os.path.join(root, sub, area), exist_ok=True)

# scene: a 8x6x3 m box of wall/floor/furniture blobs with instance ids
coord = rng.uniform(0, 1, (N, 3)).astype(np.float32) * [8.0, 6.0, 3.0]
inst = (np.floor(coord[:, 0] / 1.0) * 6 + np.floor(coord[:, 1] / 1.0)
        ).astype(np.int32)
gt = (inst % 13).astype(np.int64)
np.savez(os.path.join(root, "s3dis", area, room + ".npz"),
         coord=coord, color=np.zeros_like(coord), semantic_gt=gt,
         instance_gt=inst)

# frames: orbiting cameras; id maps through the SAME splat z-buffer the
# proxy pipeline uses, bridges through compute_bridge
k_mat = np.array([[W / 2, 0, W / 2], [0, H / 2, H / 2], [0, 0, 1]], np.float64)
center = coord.mean(0)
t_render = time.time()
for f in range(F):
    ang = 2 * np.pi * f / F
    eye = center + np.array([4.5 * np.cos(ang), 4.5 * np.sin(ang), 0.8])
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    rot = np.stack([right, -up2, fwd])
    rt = np.zeros((3, 4))
    rt[:, :3] = rot
    rt[:, 3] = -rot @ eye
    ids, depth = splat_raster(coord, inst, k_mat, rt, (H, W), splat=2,
                              background=-1)
    np.savez(os.path.join(root, "embeddings", area, room, f"f{f}.npz"),
             features=ids.astype(np.int32))
    bridge = compute_bridge(coord, k_mat, rt, depth)
    np.save(os.path.join(root, "bridge", area, room, f"f{f}.npy"), bridge)
t_render = time.time() - t_render

labels = np.where(rng.random(N) < 0.5, gt, -1).astype(np.int32)
np.save(os.path.join(root, "labels", area, room + ".npy"),
        labels.reshape(-1, 1))

# model logits: 80%-accurate with confident top-1 (the round-4 probe's
# regime), so prompt mining has realistic candidate mass
logits = rng.normal(0, 0.3, (N, 13)).astype(np.float32)
pred = np.where(rng.random(N) < 0.8, gt, (gt + 1) % 13)
logits[np.arange(N), pred] += 4.0

cfg = dict(
    labels_dir=os.path.join(root, "labels"),
    data_root=os.path.join(root, "s3dis"),
    bridge_root=os.path.join(root, "bridge"),
    embedding_root=os.path.join(root, "embeddings"),
    frame_size=(H, W), grid_scale=0.5, prompt_search="grid",
    conf_thresh=0.7, radius_scale=0.33, sam_frame_batch=4,
    num_classes=13, vote_min_fill=1, vote_min_overwrite=2,
)
predictor = OracleSamPredictor(quality=0.92)

t0 = time.time()
count, acc = _refine_one_scene((cfg, predictor, f"{area}/{room}", logits))
dt = time.time() - t0
print(f"scene N={N} F={F} {H}x{W}: refine {dt:.1f}s "
      f"(updated {count}, prompt_acc {acc:.3f}); synth render {t_render:.1f}s")
print(f"extrapolated round: {ROOMS} rooms / {WORKERS} workers "
      f"= {ROOMS * dt / WORKERS / 60:.1f} min")
