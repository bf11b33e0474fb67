"""PP2S-label supervised training entry point
(reference: tools/train_sam_pp2s.py — a standard trainer whose train
dataset runs in weak mode over the PP2S pseudo-labels)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ao_tpu.engines import (  # noqa: E402
    Trainer,
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)


def main_worker(cfg):
    cfg = default_setup(cfg)
    cfg.data.train.weak = True
    cfg.data.train.setdefault("mode", "pp2s")
    cfg.data.train.setdefault("weak_path", "data/sam_labels")
    trainer = Trainer(cfg)
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, num_devices_per_machine=args.num_devices, cfg=(cfg,))


if __name__ == "__main__":
    main()
