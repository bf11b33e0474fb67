"""Process-aware logging (reference: pointcept/utils/logger.py:36-165).

``get_root_logger`` returns a logger that writes to console (process 0 only)
and optionally to a file on every process; repeated calls reuse handlers.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_initialized = {}


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.WARNING: "\x1b[33m",
        logging.ERROR: "\x1b[31m",
        logging.CRITICAL: "\x1b[31;1m",
    }
    RESET = "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        color = self.COLORS.get(record.levelno)
        if color and sys.stderr.isatty():
            return f"{color}{msg}{self.RESET}"
        return msg


def get_root_logger(
    log_file: Optional[str] = None,
    log_level: int = logging.INFO,
    name: str = "ao_tpu",
    process_index: Optional[int] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    key = (name, log_file)
    if key in _initialized:
        return logger
    if process_index is None:
        process_index = int(os.environ.get("AO_PROCESS_INDEX", "0"))

    logger.setLevel(log_level if process_index == 0 else logging.WARNING)
    logger.propagate = False
    fmt = "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
    datefmt = "%Y-%m-%d %H:%M:%S"

    if process_index == 0 and not any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
        for h in logger.handlers
    ):
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(_ColorFormatter(fmt, datefmt=datefmt))
        logger.addHandler(sh)

    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, mode="a")
        fh.setFormatter(logging.Formatter(fmt, datefmt=datefmt))
        logger.addHandler(fh)

    _initialized[key] = True
    return logger
