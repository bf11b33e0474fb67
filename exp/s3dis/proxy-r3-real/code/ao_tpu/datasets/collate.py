"""Ragged-to-padded batch collation.

The reference packs ragged samples by concatenation + offset cumsum
(reference: pointcept/datasets/utils.py:14-54). On TPU the batch must be
fixed-shape: samples are padded to a bucketed capacity and stacked to
``(B, N_max, ...)`` with a boolean ``mask``; ``segment`` pads with the
ignore label. Bucketing (round up to ``pad_multiple``) bounds the number
of distinct compiled shapes.

``point_collate_fn`` implements Mix3D mixing (reference :43-56): with
probability ``mix_prob`` consecutive sample pairs are concatenated into
single scenes — the padded analog of dropping every other offset.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

# per-point keys that get padded+stacked onto the device
PAD_KEYS = {
    "coord": np.float32,
    "discrete_coord": np.int32,
    "feat": np.float32,
    "color": np.float32,
    "normal": np.float32,
    "strength": np.float32,
    "segment": np.int32,
    "instance": np.int32,
    "instance_center": np.float32,
    "displacement": np.float32,
}
# scalar/per-sample keys stacked without padding
STACK_KEYS = {"category": np.int32}
IGNORE_LABEL_KEYS = ("segment", "instance")


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_to(arr: np.ndarray, n: int, fill=0):
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def collate_fn(
    batch: List[Dict],
    pad_multiple: int = 1024,
    max_points: Optional[int] = None,
    ignore_index: int = -1,
) -> Dict[str, np.ndarray]:
    """Pad and stack a list of sample dicts. Returns arrays ready for
    device transfer plus ``mask``; non-array/unknown keys are returned
    under ``extras`` (host-side data like scene names)."""
    assert len(batch) > 0
    counts = [b["coord"].shape[0] for b in batch]
    n_max = _ceil_to(max(counts), pad_multiple)
    if max_points is not None:
        n_max = min(n_max, max_points)

    out: Dict[str, np.ndarray] = {}
    mask = np.zeros((len(batch), n_max), bool)
    for i, c in enumerate(counts):
        mask[i, : min(c, n_max)] = True
    out["mask"] = mask

    keys = batch[0].keys()
    extras: Dict[str, list] = {}
    for k in keys:
        if k in PAD_KEYS:
            fill = ignore_index if k in IGNORE_LABEL_KEYS else 0
            out[k] = np.stack(
                [
                    pad_to(np.asarray(b[k], PAD_KEYS[k])[:n_max], n_max, fill)
                    for b in batch
                ]
            )
        elif k in STACK_KEYS:
            out[k] = np.stack(
                [np.asarray(b[k], STACK_KEYS[k]).reshape(()) for b in batch]
            )
        elif k == "offset":
            continue  # offsets are superseded by mask
        else:
            extras[k] = [b[k] for b in batch]
    if extras:
        out["extras"] = extras
    return out


def point_collate_fn(
    batch: List[Dict],
    mix_prob: float = 0.0,
    pad_multiple: int = 1024,
    max_points: Optional[int] = None,
    ignore_index: int = -1,
):
    """Collate with Mix3D: merge consecutive sample pairs with prob mix_prob."""
    if mix_prob > 0 and len(batch) % 2 == 0 and np.random.rand() < mix_prob:
        merged = []
        for i in range(0, len(batch), 2):
            a, b = batch[i], batch[i + 1]
            m = {}
            for k in a.keys():
                if isinstance(a[k], np.ndarray) and k in PAD_KEYS:
                    m[k] = np.concatenate([a[k], b[k]], axis=0)
                else:
                    m[k] = a[k]
            merged.append(m)
        batch = merged
    return collate_fn(batch, pad_multiple, max_points, ignore_index)
