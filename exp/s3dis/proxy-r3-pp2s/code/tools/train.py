"""Training entry point (reference: tools/train.py:17-34)."""

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
    trainer = Trainer(cfg)
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, num_devices_per_machine=args.num_devices, cfg=(cfg,))


if __name__ == "__main__":
    main()
