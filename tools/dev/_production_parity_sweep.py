"""Production-path logit parity sweep vs the actual torch reference.

Extends tests/test_production_parity.py to the three TPU execution modes
so the windowed-kNN approximation is isolated from kernel numerics
(VERDICT r3 task 4; reference exact-kNN semantics:
libs/pointops/src/knn_query/knn_query_cuda_kernel.cu:60-104):

  exact    AO_EXACT_KNN=1  gathered kernels + exact tiled kNN
                           -> pure kernel/bf16 numerics delta
  gathered AO_GVA_SLAB=0   gathered kernels + multi-probe windowed kNN
                           -> + multi-probe graph approximation
  slab     (default)       slab kernels + window-restricted kNN
                           -> the production path (W=AO_SLAB_W)

The torch reference forward (CPU, CUDA deps shimmed) runs ONCE; each
mode re-jits because the env knobs are read at trace time. Run on the
chip: `python tools/dev/_production_parity_sweep.py [--cap 24576]`.
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import glob

import numpy as np


def load_room(path, cap):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=24576)
    ap.add_argument("--room", type=int, default=1)
    args = ap.parse_args()

    import torch

    from reference_shim import load_reference_ptv2m2

    rooms = sorted(glob.glob(os.path.join(ROOT, "data/s3dis_proxy/Area_1/*.npz")))
    coord_np, feat_np = load_room(rooms[args.room], args.cap)
    n = len(coord_np)
    print(f"room={os.path.basename(rooms[args.room])} N={n}", flush=True)

    ref = load_reference_ptv2m2()
    torch.manual_seed(0)
    model_t = ref.PointTransformerV2(in_channels=6, num_classes=13)
    coord_t = torch.from_numpy(coord_np)
    feat_t = torch.from_numpy(feat_np)
    offset = torch.tensor([n], dtype=torch.int32)
    model_t.train()
    with torch.no_grad():
        for _ in range(2):
            model_t({"coord": coord_t, "feat": feat_t, "offset": offset})
    model_t.eval()
    with torch.no_grad():
        ref_logits = model_t(
            {"coord": coord_t, "feat": feat_t, "offset": offset}
        ).cpu().numpy()
    scale = np.abs(ref_logits).max()
    print(f"reference logits done, scale={scale:.3e}", flush=True)

    import jax
    import jax.numpy as jnp

    from ao_tpu.models.point_transformer_v2.convert import (
        torch_state_dict_to_flax,
    )

    variables = torch_state_dict_to_flax(model_t.state_dict())

    modes = [
        ("exact", {"AO_EXACT_KNN": "1"}),
        ("gathered", {"AO_GVA_SLAB": "0"}),
        ("slab", {}),
    ]
    knobs = ["AO_EXACT_KNN", "AO_GVA_SLAB"]
    results = {}
    for name, env in modes:
        for k in knobs:
            os.environ.pop(k, None)
        os.environ.update(env)
        # fresh import state not needed: knobs are read at trace time,
        # and a new jit wrapper forces a re-trace
        from ao_tpu.models.point_transformer_v2.ptv2m2 import (
            PointTransformerV2,
        )

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
        err = np.abs(logits - ref_logits)
        agree = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
        results[name] = (err.max(), err.mean(), agree)
        print(
            f"[{name:8s}] max|d|={err.max():.3e} mean|d|={err.mean():.3e} "
            f"rel-mean={err.mean()/scale:.3e} argmax={agree:.4f}",
            flush=True,
        )
    for k in knobs:
        os.environ.pop(k, None)
    print(f"backend={jax.default_backend()} W={os.environ.get('AO_SLAB_W', '256 (default)')}")


if __name__ == "__main__":
    main()
