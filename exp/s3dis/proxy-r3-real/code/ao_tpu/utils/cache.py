"""Cross-process in-memory dataset cache (reference: pointcept/utils/cache.py:20-56).

The reference backs this with SharedArray shm:// named arrays. Here scene
dicts are memory-mapped npy files under /dev/shm — same effect (one copy
of the decoded dataset shared by all loader workers/processes) with no
extra dependency.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import numpy as np

_SHM_ROOT = os.environ.get("AO_SHM_CACHE", "/dev/shm/ao_tpu_cache")


def _slot(name: str) -> str:
    h = hashlib.sha1(name.encode()).hexdigest()[:16]
    return os.path.join(_SHM_ROOT, h)


def shared_dict(name: str, data: Dict[str, np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Get (or populate) a shared cache entry holding a dict of arrays.

    First caller passes ``data`` to populate; later callers (any process)
    get zero-copy memory-mapped views.
    """
    slot = _slot(name)
    if data is not None and not os.path.isdir(slot):
        tmp = slot + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for k, v in data.items():
            np.save(os.path.join(tmp, f"{k}.npy"), np.asarray(v))
        os.replace(tmp, slot)
    if not os.path.isdir(slot):
        raise KeyError(f"shared cache entry missing: {name}")
    out = {}
    for f in os.listdir(slot):
        if f.endswith(".npy"):
            out[f[:-4]] = np.load(os.path.join(slot, f), mmap_mode="r")
    return out


def clear_cache():
    import shutil

    if os.path.isdir(_SHM_ROOT):
        shutil.rmtree(_SHM_ROOT)
