"""Whole-scene testing entry point (reference: tools/test.py:77-93)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ao_tpu.engines import (  # noqa: E402
    TEST,
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)


def main_worker(cfg):
    cfg = default_setup(cfg)
    tester = TEST.build(dict(cfg.test))
    tester.cfg = cfg
    tester()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, num_devices_per_machine=args.num_devices, cfg=(cfg,))


if __name__ == "__main__":
    main()
