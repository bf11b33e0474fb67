"""Load the reference PT-v2m2 torch model on CPU by shimming its CUDA deps.

The reference model
(/root/reference/pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py)
imports four native/absent packages: ``pointops`` (CUDA kNN/grouping/
interpolation), ``torch_scatter.segment_csr``, ``torch_geometric``'s
``voxel_grid`` and ``timm``'s DropPath. This module installs exact CPU
equivalents into ``sys.modules`` and imports the reference file directly
(bypassing ``pointcept/__init__`` which would pull in spconv etc.), so
parity tests can compare our flax implementation against the *actual*
reference network, not a re-transcription of it.

Only used by tests; never shipped in the library.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_shims():
    import torch
    from scipy.spatial import cKDTree

    # ---- pointops ----------------------------------------------------
    pointops = types.ModuleType("pointops")

    def knn_query(nsample, xyz, offset, new_xyz=None, new_offset=None):
        """Exact per-segment kNN; idx are global row ids, dist = sqrt(d2).
        Matches libs/pointops knn heap semantics (ascending by distance,
        query point itself included at distance 0)."""
        if new_xyz is None or new_offset is None:
            new_xyz, new_offset = xyz, offset
        xyz_np = xyz.detach().cpu().numpy()
        q_np = new_xyz.detach().cpu().numpy()
        off = offset.detach().cpu().numpy().astype(np.int64)
        noff = new_offset.detach().cpu().numpy().astype(np.int64)
        idx = np.zeros((q_np.shape[0], nsample), np.int64)
        dist = np.zeros((q_np.shape[0], nsample), np.float64)
        s_k = s_q = 0
        for e_k, e_q in zip(off, noff):
            seg = xyz_np[s_k:e_k]
            k = min(nsample, len(seg))
            d, i = cKDTree(seg).query(q_np[s_q:e_q], k=k)
            if k == 1:
                d, i = d[:, None], i[:, None]
            idx[s_q:e_q, :k] = i + s_k
            dist[s_q:e_q, :k] = d
            if k < nsample:
                # CUDA heap init: best_idx=-1 / best_dist=1e10 stay in
                # place when the segment has fewer than nsample points
                # (knn_query_cuda_kernel.cu:83-87); ascending heap_sort
                # leaves the pads at the tail. The model's sign(idx+1)
                # mask then EXCLUDES them from attention softmax.
                idx[s_q:e_q, k:] = -1
                dist[s_q:e_q, k:] = 1e5  # sqrt(1e10)
            s_k, s_q = e_k, e_q
        return (
            torch.from_numpy(idx.astype(np.int64)).int(),
            torch.from_numpy(dist.astype(np.float32)),
        )

    def grouping(idx, feat, xyz, new_xyz=None, with_xyz=False):
        # mirror of libs/pointops/functions/grouping.py:37-61 (pure torch)
        if new_xyz is None:
            new_xyz = xyz
        m, nsample, c = idx.shape[0], idx.shape[1], feat.shape[1]
        xyz_p = torch.cat([xyz, torch.zeros(1, 3)], dim=0)
        feat_p = torch.cat([feat, torch.zeros(1, c)], dim=0)
        grouped_feat = feat_p[idx.view(-1).long(), :].view(m, nsample, c)
        if with_xyz:
            mask = torch.sign(idx + 1)
            grouped_xyz = xyz_p[idx.view(-1).long(), :].view(
                m, nsample, 3
            ) - new_xyz.unsqueeze(1)
            grouped_xyz = torch.einsum("n s c, n s -> n s c", grouped_xyz, mask)
            return torch.cat((grouped_xyz, grouped_feat), -1)
        return grouped_feat

    def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
        # libs/pointops/functions/interpolation.py:8-23 on CPU
        idx, dist = knn_query(k, xyz, offset, new_xyz, new_offset)
        dist_recip = 1.0 / (dist + 1e-8)
        norm = torch.sum(dist_recip, dim=1, keepdim=True)
        weight = dist_recip / norm
        new_feat = torch.zeros(new_xyz.shape[0], feat.shape[1])
        for i in range(k):
            new_feat += feat[idx[:, i].long(), :] * weight[:, i].unsqueeze(-1)
        return new_feat

    pointops.knn_query = knn_query
    pointops.grouping = grouping
    pointops.interpolation = interpolation
    sys.modules["pointops"] = pointops

    # ---- torch_scatter.segment_csr ----------------------------------
    torch_scatter = types.ModuleType("torch_scatter")

    def segment_csr(src, indptr, reduce="mean"):
        src_np = src.detach().cpu().numpy()
        ptr = indptr.detach().cpu().numpy().astype(np.int64)
        starts = ptr[:-1]
        fn = {"mean": np.add, "sum": np.add, "min": np.minimum,
              "max": np.maximum}[reduce]
        out = fn.reduceat(src_np, starts, axis=0)
        if reduce == "mean":
            counts = (ptr[1:] - starts).astype(src_np.dtype)
            out = out / counts[:, None]
        return torch.from_numpy(np.ascontiguousarray(out))

    torch_scatter.segment_csr = segment_csr
    sys.modules["torch_scatter"] = torch_scatter

    # ---- torch_geometric voxel_grid ---------------------------------
    def voxel_grid(pos, size, batch, start=0):
        p = pos.detach().cpu().numpy().astype(np.float64)
        b = batch.detach().cpu().numpy().astype(np.int64)
        g = np.floor((p - start) / size).astype(np.int64)
        g -= g.min(axis=0)
        mx = g.max(axis=0) + 1
        cluster = ((b * mx[0] + g[:, 0]) * mx[1] + g[:, 1]) * mx[2] + g[:, 2]
        return torch.from_numpy(cluster)

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_pool.voxel_grid = voxel_grid
    tg_nn.pool = tg_pool
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.pool"] = tg_pool

    # ---- timm DropPath (eval = identity) ----------------------------
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype)
            return x.div(keep) * rnd.floor_()

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    # ---- pointcept.models.{builder,utils} ---------------------------
    class _Registry:
        def register_module(self, name=None, module=None):
            if module is not None:
                return module

            def deco(cls):
                return cls

            return deco

    pc = types.ModuleType("pointcept")
    pc_models = types.ModuleType("pointcept.models")
    pc_builder = types.ModuleType("pointcept.models.builder")
    pc_builder.MODELS = _Registry()
    pc_builder.MODULES = _Registry()
    pc_utils = types.ModuleType("pointcept.models.utils")

    def offset2batch(offset):
        lengths = torch.cat([offset[:1], offset[1:] - offset[:-1]])
        return torch.repeat_interleave(
            torch.arange(len(offset)), lengths.long()
        ).long()

    def batch2offset(batch):
        return torch.cumsum(torch.bincount(batch), dim=0).int()

    pc_utils.offset2batch = offset2batch
    pc_utils.batch2offset = batch2offset
    pc_models.builder = pc_builder
    pc_models.utils = pc_utils
    pc.models = pc_models
    sys.modules.setdefault("pointcept", pc)
    sys.modules["pointcept.models"] = pc_models
    sys.modules["pointcept.models.builder"] = pc_builder
    sys.modules["pointcept.models.utils"] = pc_utils

    # ---- pointcept.utils.registry (for datasets/transform.py) -------
    class _SimpleRegistry:
        def __init__(self, name):
            self.name = name
            self.module_dict = {}

        def register_module(self, name=None, module=None, force=False):
            if module is not None:
                self.module_dict[name or module.__name__] = module
                return module

            def deco(cls):
                self.module_dict[name or cls.__name__] = cls
                return cls

            return deco

        def get(self, key):
            return self.module_dict[key]

    pc_uutils = types.ModuleType("pointcept.utils")
    pc_registry = types.ModuleType("pointcept.utils.registry")
    pc_registry.Registry = _SimpleRegistry
    pc_uutils.registry = pc_registry
    pc.utils = pc_uutils
    sys.modules["pointcept.utils"] = pc_uutils
    sys.modules["pointcept.utils.registry"] = pc_registry

    # Every stub needs a real ModuleSpec: transformers (imported later in
    # the same pytest process by test_sam) probes `timm.__spec__` via
    # importlib.util.find_spec, which raises ValueError on a sys.modules
    # entry whose __spec__ is None.
    for _name, _mod in list(sys.modules.items()):
        if (
            isinstance(_mod, types.ModuleType)
            and getattr(_mod, "__spec__", None) is None
            and (
                _name.split(".")[0]
                in ("pointops", "torch_scatter", "torch_geometric",
                    "timm", "pointcept")
            )
        ):
            _mod.__spec__ = importlib.machinery.ModuleSpec(_name, None)


_REF_CACHE = {}


def load_reference_module(relpath, name):
    """Import a reference source file with the CUDA shims installed."""
    if name in _REF_CACHE:
        return _REF_CACHE[name]
    _install_shims()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _REF_CACHE[name] = mod
    return mod


def load_reference_ptv2m2():
    return load_reference_module(
        "pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py",
        "ref_ptv2m2",
    )
