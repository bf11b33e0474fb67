"""Metric helpers (reference: pointcept/utils/misc.py:38-71).

``intersection_and_union`` computes per-class intersection/union/target
histograms for IoU metrics. Two variants: a numpy host version (whole-scene
test) and a jit-friendly jnp version usable inside an evaluation step
(histograms then ``psum`` across the data axis — the TPU analog of the
reference's ``dist.all_reduce``).
"""

from __future__ import annotations

import numpy as np


def intersection_and_union(output, target, K, ignore_index=-1, get_output=False):
    """Numpy IoU histograms. output/target: int arrays of same shape."""
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1)
    output[np.where(target == ignore_index)[0]] = ignore_index
    intersection = output[np.where(output == target)[0]]
    area_intersection, _ = np.histogram(intersection, bins=np.arange(K + 1))
    area_output, _ = np.histogram(output, bins=np.arange(K + 1))
    area_target, _ = np.histogram(target, bins=np.arange(K + 1))
    area_union = area_output + area_target - area_intersection
    if get_output:
        # AO extension: also return raw output histogram for precision/recall.
        return area_intersection, area_union, area_target, area_output
    return area_intersection, area_union, area_target


def intersection_and_union_jax(output, target, K, ignore_index=-1):
    """jnp IoU histograms with masking; safe inside jit.

    output/target: int32 arrays (any shape, flattened). Returns
    (intersection, union, target) histograms of shape (K,).
    """
    import jax.numpy as jnp

    output = output.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    output = jnp.where(valid, output, -1)

    def hist(x, mask):
        onehot = (x[:, None] == np.arange(K)[None, :]) & mask[:, None]
        return onehot.sum(axis=0)

    inter = hist(output, valid & (output == target))
    area_out = hist(output, valid)
    area_tgt = hist(target, valid)
    union = area_out + area_tgt - inter
    return inter, union, area_tgt


def make_divisible(x: int, divisor: int) -> int:
    return int(np.ceil(x / divisor) * divisor)
