"""Instance segmentation training entry point (PointGroup)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ao_tpu.engines import (  # noqa: E402
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)
from ao_tpu.engines.train_insseg import InsSegTrainer  # noqa: E402


def main_worker(cfg):
    cfg = default_setup(cfg)
    trainer = InsSegTrainer(cfg)
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, num_devices_per_machine=args.num_devices, cfg=(cfg,))


if __name__ == "__main__":
    main()
