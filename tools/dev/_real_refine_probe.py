"""Standalone REAL-refinement probe (no training).

Drives RealTrainer.refine_labels over the real proxy artifacts with
SYNTHETIC model logits of controlled accuracy, so the refinement path
(prompt mining -> SAM decode -> vote/verify -> label update) can be
validated and profiled without a 3h TPU training run. Usage:

  AO_PLATFORM=cpu python tools/dev/_real_refine_probe.py \
      --acc 0.8 --epochs 3 [--sam-oracle]

Reports per-epoch wall time, num_updated, prompt accuracy, and the
label mIoU curve — the quantities the round-3 run showed stuck at zero.
"""

import argparse
import glob
import os
import shutil
import sys
import time
import types

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

if os.environ.get("AO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["AO_PLATFORM"])

from ao_tpu.datasets.defaults import load_scene  # noqa: E402
from ao_tpu.engines.label_eval import get_miou  # noqa: E402
from ao_tpu.engines.train_real import RealTrainer  # noqa: E402
from ao_tpu.utils.logger import get_root_logger  # noqa: E402


def synth_logits(gt, acc, num_classes, rng, tau=2.0):
    """Synthetic per-point logits whose argmax matches GT with prob
    ``acc`` (errors uniform over other classes), with a temperature
    spread so top1-top2 confidence is informative."""
    n = gt.shape[0]
    pred = gt.copy()
    wrong = rng.random(n) > acc
    pred[wrong] = rng.integers(0, num_classes, wrong.sum())
    pred[gt < 0] = rng.integers(0, num_classes, (gt < 0).sum())
    logits = rng.normal(0, 0.3, (n, num_classes)).astype(np.float32)
    conf = rng.uniform(1.0, 4.0, n).astype(np.float32)
    # correct points get a bigger margin more often
    conf[~wrong] = rng.uniform(2.0, 8.0, (~wrong).sum()).astype(np.float32)
    logits[np.arange(n), pred] += conf * tau
    return logits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/ao_proxy")
    ap.add_argument("--labels", default="data/ao_proxy/sam_labels")
    ap.add_argument("--out", default="/tmp/real_probe")
    ap.add_argument("--acc", type=float, default=0.8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--num-classes", type=int, default=13)
    ap.add_argument("--sam-oracle", action="store_true", default=True)
    ap.add_argument("--oracle-quality", type=float, default=0.85)
    ap.add_argument("--frame-size", type=int, default=512)
    ap.add_argument("--conf-thresh", type=float, default=0.9)
    ap.add_argument("--vote-min-fill", type=int, default=1)
    ap.add_argument("--vote-min-overwrite", type=int, default=1)
    args = ap.parse_args()

    root = args.data_root
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    labels_dir = os.path.join(args.out, "sam_labels_on_the_fly")
    shutil.copytree(args.labels, labels_dir)

    areas = sorted(os.listdir(os.path.join(root, "s3dis")))
    areas = [a for a in areas if a != "Area_5"]
    scenes = {}
    for area in areas:
        for p in sorted(glob.glob(os.path.join(root, "s3dis", area, "*.npz"))):
            room = os.path.splitext(os.path.basename(p))[0]
            scenes[f"{area}/{room}"] = np.asarray(
                load_scene(p)["semantic_gt"], np.int64
            ).reshape(-1)

    # duck-typed trainer carcass: exactly the fields refine_labels reads
    t = types.SimpleNamespace()
    t.labels_dir = labels_dir
    t.data_root = os.path.join(root, "s3dis")
    t.bridge_root = os.path.join(root, "bridge")
    t.embedding_root = os.path.join(root, "embeddings")
    t.frame_size = (args.frame_size, args.frame_size)
    t.grid_scale = 0.5
    t.prompt_search = "grid"
    t.conf_thresh = args.conf_thresh
    t.radius_scale = 0.33
    t.sam_frame_batch = 4
    t.num_classes = args.num_classes
    t.vote_min_fill = args.vote_min_fill
    t.vote_min_overwrite = args.vote_min_overwrite
    t.eval_areas = ("Area_1",)
    t.writer = None
    t.logger = get_root_logger()
    t.epoch = 0
    t._frame_embedding = RealTrainer._frame_embedding
    t._load_embedding = RealTrainer._load_embedding
    t._refine_cfg = lambda: RealTrainer._refine_cfg(t)
    t.real_cfg = {}
    if args.sam_oracle:
        from ao_tpu.models.sam import OracleSamPredictor

        t.predictor = OracleSamPredictor(quality=args.oracle_quality)
    else:
        from ao_tpu.models.sam import SamConfig, SamPredictor

        t.predictor = SamPredictor(SamConfig.tiny())

    rng = np.random.default_rng(0)
    m0 = get_miou(labels_dir, t.data_root, args.num_classes, areas=("Area_1",))
    print(f"epoch 0 (initial): label mIoU {m0['mIoU']:.4f} "
          f"mPre {m0['mPrecision']:.4f} mRec {m0['mRecall']:.4f}")
    for ep in range(1, args.epochs + 1):
        t.epoch = ep - 1
        basket = {
            k: synth_logits(gt, args.acc, args.num_classes, rng)
            for k, gt in scenes.items()
        }
        t0 = time.time()
        RealTrainer.refine_labels(t, basket)
        print(f"epoch {ep}: refinement took {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
