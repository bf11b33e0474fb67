"""Checkpointing with atomic replace and best/last semantics.

Mirrors the reference CheckpointSaver/Loader contract
(reference: pointcept/engines/hooks/misc.py:147-252): a checkpoint is a dict
of ``{epoch, state, best_metric_value, ...}`` written to ``<path>.tmp`` and
atomically ``os.replace``d; ``model_best`` is copied on improvement. The
payload is serialized with flax msgpack (framework-native, no pickle of
device arrays). Partial/keyword-filtered loads support fine-tuning.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, meta: Optional[Dict] = None):
    """Atomically write {meta, state} to ``path``. Arbitrary pytrees
    (flax struct dataclasses, optax states) go through to_state_dict."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "meta": dict(meta or {}),
        "state": _to_host(serialization.to_state_dict(state)),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target_state: Any = None):
    """Load a checkpoint; if ``target_state`` is given, restore into its
    structure (shape/dtype-checked), else return raw trees.

    Returns (state, meta).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = payload.get("meta", {})
    raw_state = payload.get("state", payload)
    if target_state is not None:
        state = serialization.from_state_dict(target_state, raw_state)
        return state, meta
    return raw_state, meta


def copy_best(path: str, best_path: str):
    shutil.copyfile(path, best_path)


def filter_state_dict(state_dict: Dict, keywords: Dict[str, str]) -> Dict:
    """Keyword-filtered / renamed partial load for fine-tuning
    (reference: hooks/misc.py:213-239). ``keywords`` maps substring ->
    replacement; keys matching a substring are renamed (empty replacement
    keeps the key), keys matching none are kept as-is unless keywords has
    the special entry {"": ""}."""
    out = {}
    for k, v in state_dict.items():
        new_k = k
        for kw, rep in keywords.items():
            if kw and kw in k:
                new_k = k.replace(kw, rep)
                break
        out[new_k] = v
    return out
