"""Production-path logit fidelity vs the ACTUAL torch reference.

test_reference_parity.py proves parity at N=1152 — exactly the exact-kNN
small-N path. This test runs a grid-sampled proxy room at production
scale (tens of thousands of points) through (i) the reference torch
PT-v2m2 on CPU (CUDA shimmed, exact KD-tree kNN — the reference's heap
kNN semantics, libs/pointops knn_query_cuda_kernel.cu:60-104) and
(ii) our model with the SAME converted weights, and reports max/mean
logit delta + argmax agreement.

On CPU (the default tier) our side uses the gathered path with
multi-probe approximate kNN. Run with AO_TEST_TPU=1 on a chip to
measure the REAL production path (Morton slab kernels + window-
restricted kNN + bf16): the asserted floor is loose because the
approximate graph legitimately flips near-tie argmaxes; the printed
numbers are the deliverable (recorded in ARCHITECTURE.md).
"""

import glob
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(__file__))

DATA = sorted(glob.glob("data/s3dis_proxy/Area_1/*.npz"))


def _load_room(path, cap=24576):
    d = np.load(path)
    coord = np.asarray(d["coord"], np.float32)
    color = np.asarray(d["color"], np.float32)
    key = np.floor((coord - coord.min(0)) / 0.04).astype(np.int64)
    k1 = (key[:, 0] << 42) | (key[:, 1] << 21) | key[:, 2]
    _, first = np.unique(k1, return_index=True)
    sel = np.sort(first)
    coord, color = coord[sel], color[sel]
    if len(coord) > cap:
        from scipy.spatial import cKDTree

        center = coord[np.random.RandomState(0).randint(len(coord))]
        _, idx = cKDTree(coord).query(center, k=cap)
        idx = np.sort(idx)
        coord, color = coord[idx], color[idx]
    coord = coord - coord.mean(0, keepdims=True)
    feat = np.concatenate([coord, color / 127.5 - 1.0], axis=1)
    return coord.astype(np.float32), feat.astype(np.float32)


@pytest.mark.skipif(not DATA, reason="proxy dataset not generated")
def test_production_scale_logit_fidelity():
    import torch

    import jax
    import jax.numpy as jnp

    from reference_shim import load_reference_ptv2m2
    from ao_tpu.models.point_transformer_v2.convert import (
        torch_state_dict_to_flax,
    )
    from ao_tpu.models.point_transformer_v2.ptv2m2 import PointTransformerV2

    coord_np, feat_np = _load_room(DATA[1])
    n = len(coord_np)

    ref = load_reference_ptv2m2()
    torch.manual_seed(0)
    model = ref.PointTransformerV2(in_channels=6, num_classes=13)
    coord_t = torch.from_numpy(coord_np)
    feat_t = torch.from_numpy(feat_np)
    offset = torch.tensor([n], dtype=torch.int32)
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model({"coord": coord_t, "feat": feat_t, "offset": offset})
    model.eval()
    with torch.no_grad():
        ref_logits = model(
            {"coord": coord_t, "feat": feat_t, "offset": offset}
        ).cpu().numpy()

    variables = torch_state_dict_to_flax(model.state_dict())
    ours = PointTransformerV2(
        in_channels=6, num_classes=13, stage_cap_ratios=(0.7,) * 4
    )
    logits = jax.jit(
        lambda v, c, f, m: ours.apply(v, c, f, m, True, True)
    )(
        variables,
        jnp.asarray(coord_np)[None],
        jnp.asarray(feat_np)[None],
        jnp.ones((1, n), bool),
    )
    logits = np.asarray(logits, np.float32)[0]

    scale = np.abs(ref_logits).max()
    err = np.abs(logits - ref_logits)
    agree = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    backend = jax.default_backend()
    print(
        f"\n[production parity] backend={backend} N={n}: "
        f"max|d|={err.max():.3e} mean|d|={err.mean():.3e} "
        f"scale={scale:.3e} argmax agreement={agree:.4f}"
    )
    # loose floor: the production path's approximate graph + bf16 may
    # flip near-tie argmaxes; wholesale divergence (e.g. a zeroed graph,
    # the round-4 denormal bug) craters agreement far below this
    assert agree > 0.9, f"argmax agreement {agree}"
    assert err.mean() < 0.1 * max(scale, 1.0)
