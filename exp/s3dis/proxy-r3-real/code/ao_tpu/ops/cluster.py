"""ctypes bindings for the native clustering library.

Replaces the reference's pointgroup_ops (ballquery_batch_p + bfs_cluster,
libs/pointgroup_ops) with one fused native call: connected components over
the radius graph of same-semantic-label points (grid-hash neighbour
search + BFS in native/cluster.cpp). Compiles the shared library on first
use (g++ is part of the toolchain image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaocluster.so")
_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "cluster.cpp")
    if not os.path.isfile(_LIB_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True,
        )
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.ao_bfs_cluster.restype = ctypes.c_int32
    _lib.ao_bfs_cluster.argtypes = [
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return _lib


def bfs_cluster(
    coords: np.ndarray,  # (N, 3) float32
    semantic: np.ndarray,  # (N,) int32, <0 = never clustered
    batch: Optional[np.ndarray] = None,  # (N,) int32
    radius: float = 1.5,
    min_points: int = 50,
):
    """Returns (labels (N,) int32 component id / -1, n_clusters)."""
    lib = _load()
    coords = np.ascontiguousarray(coords, np.float32)
    semantic = np.ascontiguousarray(semantic, np.int32)
    n = coords.shape[0]
    if batch is None:
        batch = np.zeros(n, np.int32)
    batch = np.ascontiguousarray(batch, np.int32)
    out = np.empty(n, np.int32)
    n_clusters = lib.ao_bfs_cluster(
        n,
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        semantic.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_float(radius),
        min_points,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(n_clusters)
