"""CLI defaults (reference: pointcept/engines/defaults.py).

``default_config_parser`` implements the reference's config-name protocol
(``<dataset>/<name>.py``; ``cfg.data.train.loop = epoch // eval_epoch``
mega-epoch scheme, defaults.py:109-128) and dumps the resolved config to
the experiment dir for exact resume. ``default_setup`` derives per-process
seeds. There is no ``create_ddp_model``/world-size batch splitting: the
mesh-sharded jitted step replaces DDP, and batch_size stays the global
batch size.
"""

from __future__ import annotations

import argparse
import os

import jax

from ao_tpu.utils import Config, DictAction, get_root_logger
from ao_tpu.utils.env import get_random_seed


def default_argument_parser(epilog=None):
    parser = argparse.ArgumentParser(
        epilog=epilog or "ao_tpu launcher", add_help=True
    )
    parser.add_argument(
        "--config-file", default="", metavar="FILE", help="path to config file"
    )
    parser.add_argument(
        "--num-devices", type=int, default=None,
        help="restrict to N local devices (default: all)",
    )
    parser.add_argument(
        "--options", nargs="+", action=DictAction, default={},
        help="config overrides: key=value (nested keys with dots)",
    )
    return parser


def default_config_parser(file_path: str, options: dict) -> Config:
    if os.path.isfile(file_path):
        cfg = Config.fromfile(file_path)
    else:
        raise FileNotFoundError(f"config not found: {file_path}")
    if options:
        cfg.merge_from_dict(options)

    if cfg.get("seed") is None:
        cfg.seed = get_random_seed()

    cfg.setdefault("data", {})
    cfg.data.setdefault("train", {})
    # mega-epoch scheme: dataset loops epoch//eval_epoch times per eval epoch
    if cfg.get("epoch") and cfg.get("eval_epoch"):
        cfg.data.train.loop = max(cfg.epoch // cfg.eval_epoch, 1)
    else:
        cfg.setdefault("eval_epoch", cfg.get("epoch", 1))

    os.makedirs(cfg.save_path, exist_ok=True)
    if not cfg.get("resume", False):
        cfg.dump(os.path.join(cfg.save_path, "config.py"))
    return cfg


def default_setup(cfg: Config) -> Config:
    # Persistent XLA compile cache: production kernels cold-compile in
    # minutes (see ARCHITECTURE.md compile budget), so every entry point
    # shares one on-disk cache keyed by HLO — a reconfigured rerun or the
    # bench driver then reuses the training run's executables.
    cache_dir = os.environ.get("AO_COMPILE_CACHE",
                               "/root/.cache/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover - older jax without the flag
        pass
    os.environ.setdefault("AO_PROCESS_INDEX", str(jax.process_index()))
    logger = get_root_logger(process_index=jax.process_index())
    logger.info(
        f"Process {jax.process_index()}/{jax.process_count()}; "
        f"devices: {jax.device_count()} total / {jax.local_device_count()} local"
    )
    seed = cfg.get("seed")
    if seed is not None:
        # decorrelate processes like the reference's per-rank seeds
        cfg.seed = seed + jax.process_index() * 11027
    return cfg
