"""Pseudo-label quality evaluation CLI (reference: engines/my_evaluate.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ao_tpu.engines.label_eval import TRAIN_AREAS, get_miou  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred_root", help="dir of <area>/<room>.npy pseudo-labels")
    p.add_argument("--data-root", default="data/s3dis")
    p.add_argument("--num-classes", type=int, default=13)
    p.add_argument("--areas", nargs="+", default=list(TRAIN_AREAS))
    args = p.parse_args()
    m = get_miou(
        args.pred_root, args.data_root, args.num_classes,
        areas=tuple(args.areas),
    )
    print(
        f"mIoU {m['mIoU']:.4f}  mPrecision {m['mPrecision']:.4f}  "
        f"mRecall {m['mRecall']:.4f}  ({m['num_scenes']} scenes)"
    )


if __name__ == "__main__":
    main()
