"""Cross-process communication helpers (reference: pointcept/utils/comm.py).

The reference wraps torch.distributed (NCCL + a gloo group for pickled
objects). Under single-controller JAX: world size = jax.process_count(),
device collectives live inside jitted code (psum etc. emitted by XLA),
and host-side object gathers use multihost_utils. Same function names so
engine code ports directly.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    return 0  # one controller process per host


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize():
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ao_tpu_sync")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from every process to every process
    (reference comm.py:103; pickle over the device interconnect)."""
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world)
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather to one process (others get [])."""
    out = all_gather(data)
    return out if jax.process_index() == dst else []


def shared_random_seed() -> int:
    """A seed shared by all processes (reference comm.py:158)."""
    seed = np.random.randint(2**31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: Dict[str, float], average: bool = True) -> Dict:
    """Mean/sum scalar dicts across processes (reference comm.py:171)."""
    world = jax.process_count()
    if world == 1:
        return dict(input_dict)
    gathered = all_gather(input_dict)
    keys = sorted(input_dict.keys())
    out = {}
    for k in keys:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / world if average else sum(vals)
    return out
