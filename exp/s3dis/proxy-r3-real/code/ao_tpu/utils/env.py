"""Seeding and determinism (reference: pointcept/utils/env.py:17-36).

On TPU, determinism comes from (a) explicit ``jax.random`` key threading in
the compute path and (b) seeded numpy generators in the host data pipeline —
there is no cudnn-style nondeterminism to disable. ``set_seed`` seeds the
global python/numpy RNGs (host-side transforms) and returns a ``jax`` PRNG
key for the device side.
"""

from __future__ import annotations

import os
import random
from datetime import datetime

import numpy as np


def get_random_seed() -> int:
    return (
        os.getpid()
        + int(datetime.now().strftime("%S%f"))
        + int.from_bytes(os.urandom(2), "big")
    ) % (2**31)


def set_seed(seed=None):
    """Seed host RNGs; return (seed, jax PRNG key)."""
    import jax

    if seed is None:
        seed = get_random_seed()
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed, jax.random.PRNGKey(seed)
