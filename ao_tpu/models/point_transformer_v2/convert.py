"""Convert reference PT-v2m2 (torch) checkpoints to ao_tpu flax variables.

The reference implementation
(/root/reference/pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py:447-576)
stores parameters as a flat ``state_dict``; this module maps every tensor
onto the corresponding leaf of our flax module tree
(``ao_tpu/models/point_transformer_v2/ptv2m2.py``) so reference-trained
checkpoints load directly. ``flax_to_torch_state_dict`` is the exact
inverse, so ao_tpu-trained models export to reference-format consumers
(and trained-weight parity can be tested in both directions).

Name correspondence (torch -> flax):

* ``patch_embed.proj.0`` -> top-level ``Dense_0`` (+ ``PointBatchNorm_0``)
* ``{patch_embed,enc_stages.i.blocks,dec_stages.i.blocks}.blocks.j`` ->
  ``{patch_embed,enc{i}_blocks,dec{i}_blocks}/Block_{j}`` with
  fc1 -> Dense_0, norm1 -> PointBatchNorm_0, fc3 -> Dense_1,
  norm2 -> PointBatchNorm_1, norm3 -> PointBatchNorm_2
* GVA: linear_q -> Dense_0/PointBatchNorm_0, linear_k ->
  Dense_1/PointBatchNorm_1, linear_v -> Dense_2; the pe / weight-encoding
  MLPs map onto the raw kernel parameters (pe_w1..., we_w1...) shared by
  the fused TPU kernel and the unfused composition
* ``enc_stages.i.down`` -> ``enc{i}_pool``; ``dec_stages.i.up`` ->
  ``dec{i}_up`` (proj -> Dense_0/PBN_0, proj_skip -> Dense_1/PBN_1)
* ``seg_head.{0,1,3}`` -> top-level ``Dense_1``/``PointBatchNorm_1``/``Dense_2``

Torch ``Linear.weight`` is (out, in) and flax ``Dense.kernel`` is
(in, out): every kernel transposes. BatchNorm running statistics land in
the ``batch_stats`` collection (our PointBatchNorm keys ``mean``/``var``;
the GVA raw-param BNs use ``pe_bn_*`` / ``we_bn_*``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Loader:
    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd


def _dense(ld, tname, params, fpath, bias=True):
    _set(params, fpath + ("kernel",), ld.take(tname + ".weight").T)
    if bias:
        _set(params, fpath + ("bias",), ld.take(tname + ".bias"))


def _pbn(ld, tname, params, stats, fpath):
    """torch PointBatchNorm wrapper (``<tname>.norm`` is the BatchNorm1d)."""
    _set(params, fpath + ("scale",), ld.take(tname + ".norm.weight"))
    _set(params, fpath + ("bias",), ld.take(tname + ".norm.bias"))
    _set(stats, fpath + ("mean",), ld.take(tname + ".norm.running_mean"))
    _set(stats, fpath + ("var",), ld.take(tname + ".norm.running_var"))


def _gva(ld, t, params, stats, path, qkv_bias=True):
    g = path + ("GroupedVectorAttention_0",)
    _dense(ld, t + ".linear_q.0", params, g + ("Dense_0",), qkv_bias)
    _pbn(ld, t + ".linear_q.1", params, stats, g + ("PointBatchNorm_0",))
    _dense(ld, t + ".linear_k.0", params, g + ("Dense_1",), qkv_bias)
    _pbn(ld, t + ".linear_k.1", params, stats, g + ("PointBatchNorm_1",))
    _dense(ld, t + ".linear_v", params, g + ("Dense_2",), qkv_bias)
    # pe-bias MLP -> raw params (Dense -> BN -> ReLU -> Dense)
    _set(params, g + ("pe_w1",), ld.take(t + ".linear_p_bias.0.weight").T)
    _set(params, g + ("pe_b1",), ld.take(t + ".linear_p_bias.0.bias"))
    _set(params, g + ("pe_bn_scale",), ld.take(t + ".linear_p_bias.1.norm.weight"))
    _set(params, g + ("pe_bn_bias",), ld.take(t + ".linear_p_bias.1.norm.bias"))
    _set(stats, g + ("pe_bn_mean",), ld.take(t + ".linear_p_bias.1.norm.running_mean"))
    _set(stats, g + ("pe_bn_var",), ld.take(t + ".linear_p_bias.1.norm.running_var"))
    _set(params, g + ("pe_w2",), ld.take(t + ".linear_p_bias.3.weight").T)
    _set(params, g + ("pe_b2",), ld.take(t + ".linear_p_bias.3.bias"))
    # weight-encoding MLP
    _set(params, g + ("we_w1",), ld.take(t + ".weight_encoding.0.weight").T)
    _set(params, g + ("we_b1",), ld.take(t + ".weight_encoding.0.bias"))
    _set(params, g + ("we_bn_scale",), ld.take(t + ".weight_encoding.1.norm.weight"))
    _set(params, g + ("we_bn_bias",), ld.take(t + ".weight_encoding.1.norm.bias"))
    _set(stats, g + ("we_bn_mean",), ld.take(t + ".weight_encoding.1.norm.running_mean"))
    _set(stats, g + ("we_bn_var",), ld.take(t + ".weight_encoding.1.norm.running_var"))
    _set(params, g + ("we_w2",), ld.take(t + ".weight_encoding.3.weight").T)
    _set(params, g + ("we_b2",), ld.take(t + ".weight_encoding.3.bias"))


def _block(ld, t, params, stats, path, qkv_bias=True):
    _dense(ld, t + ".fc1", params, path + ("Dense_0",), bias=False)
    _pbn(ld, t + ".norm1", params, stats, path + ("PointBatchNorm_0",))
    _gva(ld, t + ".attn", params, stats, path, qkv_bias)
    _pbn(ld, t + ".norm2", params, stats, path + ("PointBatchNorm_1",))
    _dense(ld, t + ".fc3", params, path + ("Dense_1",), bias=False)
    _pbn(ld, t + ".norm3", params, stats, path + ("PointBatchNorm_2",))


def _block_seq(ld, t, params, stats, path, qkv_bias=True):
    j = 0
    while ld.has(f"{t}.blocks.{j}.fc1.weight"):
        _block(ld, f"{t}.blocks.{j}", params, stats, path + (f"Block_{j}",),
               qkv_bias)
        j += 1
    if j == 0:
        raise KeyError(f"no blocks under {t}")


def torch_state_dict_to_flax(state_dict, qkv_bias: bool = True):
    """Map a reference PT-v2m2 ``state_dict`` to flax ``{params, batch_stats}``.

    Accepts either raw tensors or numpy arrays; strips a leading
    ``module.`` (DDP) and ``backbone.`` (DefaultSegmentor wrapper) prefix.
    """
    sd = {}
    for k, v in dict(state_dict).items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("backbone."):
            k = k[len("backbone."):]
        sd[k] = v
    ld = _Loader(sd)
    params: Dict = {}
    stats: Dict = {}

    _dense(ld, "patch_embed.proj.0", params, ("Dense_0",), bias=False)
    _pbn(ld, "patch_embed.proj.1", params, stats, ("PointBatchNorm_0",))
    _block_seq(ld, "patch_embed.blocks", params, stats, ("patch_embed",),
               qkv_bias)

    i = 0
    while ld.has(f"enc_stages.{i}.down.fc.weight"):
        _dense(ld, f"enc_stages.{i}.down.fc", params,
               (f"enc{i}_pool", "Dense_0"), bias=False)
        _pbn(ld, f"enc_stages.{i}.down.norm", params, stats,
             (f"enc{i}_pool", "PointBatchNorm_0"))
        _block_seq(ld, f"enc_stages.{i}.blocks", params, stats,
                   (f"enc{i}_blocks",), qkv_bias)
        _dense(ld, f"dec_stages.{i}.up.proj.0", params,
               (f"dec{i}_up", "Dense_0"))
        _pbn(ld, f"dec_stages.{i}.up.proj.1", params, stats,
             (f"dec{i}_up", "PointBatchNorm_0"))
        _dense(ld, f"dec_stages.{i}.up.proj_skip.0", params,
               (f"dec{i}_up", "Dense_1"))
        _pbn(ld, f"dec_stages.{i}.up.proj_skip.1", params, stats,
             (f"dec{i}_up", "PointBatchNorm_1"))
        _block_seq(ld, f"dec_stages.{i}.blocks", params, stats,
                   (f"dec{i}_blocks",), qkv_bias)
        i += 1
    if i == 0:
        raise KeyError("no enc_stages in state_dict")

    if ld.has("seg_head.0.weight"):
        _dense(ld, "seg_head.0", params, ("Dense_1",))
        _pbn(ld, "seg_head.1", params, stats, ("PointBatchNorm_1",))
        _dense(ld, "seg_head.3", params, ("Dense_2",))

    unused = [k for k in ld.sd if k not in ld.used
              and "num_batches_tracked" not in k]
    if unused:
        raise KeyError(f"unconverted reference tensors: {unused[:8]}")
    import jax.numpy as jnp

    tree = lambda d: {  # noqa: E731
        k: tree(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in d.items()
    }
    return {"params": tree(params), "batch_stats": tree(stats)}


# --- inverse: flax variables -> reference torch state_dict ---


def _get(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


class _Writer:
    """Emits reference state_dict tensors; mirrors _Loader's bookkeeping."""

    def __init__(self, params, stats):
        self.params = params
        self.stats = stats
        self.out: Dict[str, np.ndarray] = {}

    def dense(self, fpath, tname, bias=True):
        self.out[tname + ".weight"] = _get(self.params, fpath + ("kernel",)).T
        if bias:
            self.out[tname + ".bias"] = _get(self.params, fpath + ("bias",))

    def pbn(self, fpath, tname):
        self.out[tname + ".norm.weight"] = _get(self.params, fpath + ("scale",))
        self.out[tname + ".norm.bias"] = _get(self.params, fpath + ("bias",))
        self.out[tname + ".norm.running_mean"] = _get(self.stats, fpath + ("mean",))
        self.out[tname + ".norm.running_var"] = _get(self.stats, fpath + ("var",))
        self.out[tname + ".norm.num_batches_tracked"] = np.asarray(0, np.int64)

    def raw(self, tree, fpath, tname, transpose=False):
        v = _get(tree, fpath)
        self.out[tname] = v.T if transpose else v

    def has(self, tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True


def _inv_gva(w: _Writer, t, path, qkv_bias=True):
    g = path + ("GroupedVectorAttention_0",)
    w.dense(g + ("Dense_0",), t + ".linear_q.0", qkv_bias)
    w.pbn(g + ("PointBatchNorm_0",), t + ".linear_q.1")
    w.dense(g + ("Dense_1",), t + ".linear_k.0", qkv_bias)
    w.pbn(g + ("PointBatchNorm_1",), t + ".linear_k.1")
    w.dense(g + ("Dense_2",), t + ".linear_v", qkv_bias)
    w.raw(w.params, g + ("pe_w1",), t + ".linear_p_bias.0.weight", True)
    w.raw(w.params, g + ("pe_b1",), t + ".linear_p_bias.0.bias")
    w.raw(w.params, g + ("pe_bn_scale",), t + ".linear_p_bias.1.norm.weight")
    w.raw(w.params, g + ("pe_bn_bias",), t + ".linear_p_bias.1.norm.bias")
    w.raw(w.stats, g + ("pe_bn_mean",), t + ".linear_p_bias.1.norm.running_mean")
    w.raw(w.stats, g + ("pe_bn_var",), t + ".linear_p_bias.1.norm.running_var")
    w.out[t + ".linear_p_bias.1.norm.num_batches_tracked"] = np.asarray(0, np.int64)
    w.raw(w.params, g + ("pe_w2",), t + ".linear_p_bias.3.weight", True)
    w.raw(w.params, g + ("pe_b2",), t + ".linear_p_bias.3.bias")
    w.raw(w.params, g + ("we_w1",), t + ".weight_encoding.0.weight", True)
    w.raw(w.params, g + ("we_b1",), t + ".weight_encoding.0.bias")
    w.raw(w.params, g + ("we_bn_scale",), t + ".weight_encoding.1.norm.weight")
    w.raw(w.params, g + ("we_bn_bias",), t + ".weight_encoding.1.norm.bias")
    w.raw(w.stats, g + ("we_bn_mean",), t + ".weight_encoding.1.norm.running_mean")
    w.raw(w.stats, g + ("we_bn_var",), t + ".weight_encoding.1.norm.running_var")
    w.out[t + ".weight_encoding.1.norm.num_batches_tracked"] = np.asarray(0, np.int64)
    w.raw(w.params, g + ("we_w2",), t + ".weight_encoding.3.weight", True)
    w.raw(w.params, g + ("we_b2",), t + ".weight_encoding.3.bias")


def _inv_block(w: _Writer, t, path, qkv_bias=True):
    w.dense(path + ("Dense_0",), t + ".fc1", bias=False)
    w.pbn(path + ("PointBatchNorm_0",), t + ".norm1")
    _inv_gva(w, t + ".attn", path, qkv_bias)
    w.pbn(path + ("PointBatchNorm_1",), t + ".norm2")
    w.dense(path + ("Dense_1",), t + ".fc3", bias=False)
    w.pbn(path + ("PointBatchNorm_2",), t + ".norm3")


def _inv_block_seq(w: _Writer, t, path, qkv_bias=True):
    j = 0
    while w.has(w.params, path + (f"Block_{j}",)):
        _inv_block(w, f"{t}.blocks.{j}", path + (f"Block_{j}",), qkv_bias)
        j += 1
    if j == 0:
        raise KeyError(f"no blocks under flax path {path}")


def flax_to_torch_state_dict(variables, qkv_bias: bool = True):
    """Exact inverse of :func:`torch_state_dict_to_flax`: map ao_tpu flax
    ``{params, batch_stats}`` (backbone subtree) onto a reference PT-v2m2
    ``state_dict`` (numpy arrays; wrap with ``torch.from_numpy`` to load).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if "backbone" in params:  # DefaultSegmentor wrapper
        params = params["backbone"]
        stats = stats.get("backbone", stats)
    w = _Writer(params, stats)

    w.dense(("Dense_0",), "patch_embed.proj.0", bias=False)
    w.pbn(("PointBatchNorm_0",), "patch_embed.proj.1")
    _inv_block_seq(w, "patch_embed.blocks", ("patch_embed",), qkv_bias)

    i = 0
    while w.has(w.params, (f"enc{i}_pool",)):
        w.dense((f"enc{i}_pool", "Dense_0"), f"enc_stages.{i}.down.fc",
                bias=False)
        w.pbn((f"enc{i}_pool", "PointBatchNorm_0"), f"enc_stages.{i}.down.norm")
        _inv_block_seq(w, f"enc_stages.{i}.blocks", (f"enc{i}_blocks",),
                       qkv_bias)
        w.dense((f"dec{i}_up", "Dense_0"), f"dec_stages.{i}.up.proj.0")
        w.pbn((f"dec{i}_up", "PointBatchNorm_0"), f"dec_stages.{i}.up.proj.1")
        w.dense((f"dec{i}_up", "Dense_1"), f"dec_stages.{i}.up.proj_skip.0")
        w.pbn((f"dec{i}_up", "PointBatchNorm_1"),
              f"dec_stages.{i}.up.proj_skip.1")
        _inv_block_seq(w, f"dec_stages.{i}.blocks", (f"dec{i}_blocks",),
                       qkv_bias)
        i += 1
    if i == 0:
        raise KeyError("no enc stages in flax params")

    if w.has(w.params, ("Dense_1",)):
        w.dense(("Dense_1",), "seg_head.0")
        w.pbn(("PointBatchNorm_1",), "seg_head.1")
        w.dense(("Dense_2",), "seg_head.3")
    return w.out
