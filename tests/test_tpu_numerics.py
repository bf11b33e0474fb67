"""On-TPU numerics regression tests.

The fast tier runs on CPU, where two classes of TPU-only corruption are
invisible: (a) denormal flush-to-zero (the round-4 finding: int32 ids
bitcast into f32 lanes became denormals and every id below ~2^23 read
back 0 — zeroed unpool graphs cost a training run 0.15 mIoU), and
(b) Mosaic lowering divergence from interpret mode. These tests run only
when a TPU backend is present (e.g. ``pytest tests/test_tpu_numerics.py``
on the chip); CI/CPU runs skip them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="requires a TPU backend"
    ),
]


def _recall(idx, valid, exact):
    hits = tot = 0
    for q in range(0, idx.shape[0], 3):
        got = set(idx[q][valid[q]].tolist())
        ex = set(exact[q].tolist())
        hits += len(got & ex)
        tot += exact.shape[1]
    return hits / tot


def test_knn_self_spatial_recall_on_tpu():
    from scipy.spatial import cKDTree

    from ao_tpu.ops import knn_self_spatial

    rng = np.random.default_rng(0)
    cs = rng.uniform(0, 4, (1, 4096, 3)).astype(np.float32)
    _, exact = cKDTree(cs[0]).query(cs[0], k=16)
    idx, _, valid = knn_self_spatial(
        jnp.asarray(cs), jnp.asarray(np.ones((1, 4096), bool)), k=16
    )
    r = _recall(np.asarray(idx)[0], np.asarray(valid)[0], exact)
    assert r > 0.95, f"multi-probe kNN recall collapsed on TPU: {r}"


def test_knn_cross_spatial_recall_on_tpu():
    from scipy.spatial import cKDTree

    from ao_tpu.ops import knn_cross_spatial

    rng = np.random.default_rng(1)
    keys = rng.uniform(0, 4, (1, 2048, 3)).astype(np.float32)
    qs = rng.uniform(0, 4, (1, 4096, 3)).astype(np.float32)
    _, exact = cKDTree(keys[0]).query(qs[0], k=3)
    idx, _, valid = knn_cross_spatial(jnp.asarray(qs), jnp.asarray(keys), 3)
    r = _recall(np.asarray(idx)[0], np.asarray(valid)[0], exact)
    assert r > 0.95, f"cross-cloud kNN recall collapsed on TPU: {r}"


@pytest.mark.parametrize(
    "C,G,TQ,J", [(48, 6, 128, 9), (96, 12, 128, 9), (192, 24, 64, 17),
                 (384, 48, 32, 17)]
)
def test_slab_kernels_match_gathered_on_tpu(C, G, TQ, J):
    """Mosaic-lowered slab GVA must match the gathered fused path on the
    identical graph at every production stage geometry (forward
    bit-near-exact; recorded sweep: tools/dev/_slab_chip_parity.py)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.dev._slab_chip_parity import build_case, S

    from ao_tpu.ops.pallas import gva_fused as gf
    from ao_tpu.ops.pallas import gva_slab as gs

    N = 4096
    c = build_case(C, G, TQ, J, N)
    P, gp, bpv, wp = c["P"], c["gp"], c["bpv"], c["wp"]
    ro, rsw, _ = jax.jit(
        lambda kvp, qrow, v: gf.gva_core(
            kvp, qrow, v, P["Wp1"], P["bp1"], gp, bpv, P["Wp2"], P["bp2"],
            wp, None, S, C, G, TQ)
    )(c["kvp"], c["qrow"], c["validb"])
    o, sw_, _ = jax.jit(
        lambda kv, idxp, qrow, v: gs.gva_slab_core(
            kv, idxp, qrow, v, P["Wp1"], P["bp1"], gp, bpv, P["Wp2"],
            P["bp2"], wp, None, c["NP"], S, C, G, TQ, J)
    )(c["kv_pad"], c["idxp"], c["qrow"], c["validb"])
    ro, o = np.asarray(ro, np.float32), np.asarray(o, np.float32)
    scale = max(np.abs(ro).max(), 1.0)
    assert np.abs(o[:, :N] - ro[:, :N]).max() / scale < 1e-4
    assert float(jnp.abs(sw_[0] - rsw[0]).max()) < 1e-3


def test_sam_vit_h_instantiates_at_scale():
    """SAM at the reference's real scale (ViT-H, 637M params;
    my_decode_embedding_final.py) must jit and run on the chip: encoder
    on a 1024^2 frame, decoder on a 16-prompt batch. Guards the scale
    evidence recorded in ARCHITECTURE.md (177 ms/frame encoder)."""
    from ao_tpu.models.sam.modeling import SamConfig, SamModel
    from ao_tpu.models.sam.predictor import SamPredictor

    cfg = SamConfig.vit_h()
    model = SamModel(cfg)
    x = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    # one FULL init (encoder + decoder) reused by the predictor below —
    # SamPredictor(cfg, None) would otherwise re-init all 637M params
    params = jax.jit(
        lambda r: model.init(
            r, x, jnp.zeros((1, 1, 1, 2)), jnp.zeros((1, 1, 1), jnp.int32),
            True,
        )
    )(jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )
    assert n_params > 600e6, f"vit_h lost parameters: {n_params/1e6:.0f}M"
    emb = jax.jit(
        lambda v, im: model.apply(v, im, method=model.get_image_embeddings)
    )(params, x)
    emb_arr = np.asarray(jax.tree_util.tree_leaves(emb)[0])
    assert emb_arr.shape[-3:] == (64, 64, 256)

    pred = SamPredictor(cfg, params)
    pred.set_features(emb_arr, (1080, 1080))
    pts = np.asarray(
        np.random.RandomState(0).rand(16, 1, 2) * 1080, np.float32
    )
    masks, scores, _ = pred.predict(pts, np.ones((16, 1), np.int32))
    assert np.asarray(masks).shape[:2] == (16, 3)
