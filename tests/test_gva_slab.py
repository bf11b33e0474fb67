"""Parity tests for the slab-resident GVA kernels (interpret mode, CPU).

The slab kernels (ops/pallas/gva_slab.py) replace the XLA-gathered
``(B, N*S, rw)`` neighbour-row input of gva_fused with in-VMEM one-hot
gathers from contiguous Morton slabs. Given the SAME neighbour graph
(every edge in-slab), they must reproduce gva_core bit-near-exactly:
the attention math is shared (_recompute/_softmax/_peb_bwd), only the
row transport differs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.ops.knn_spatial import knn_self_presorted, knn_self_spatial
from ao_tpu.ops.pallas import gva_fused as gf
from ao_tpu.ops.pallas import gva_slab as gs

B, N, S, C, G, TQ, J = 2, 90, 8, 16, 4, 32, 3
W = (J - 1) // 2 * TQ  # 32
NP = -(-N // TQ) * TQ  # 96


def _params(rng):
    P = {
        k: jnp.asarray(rng.normal(size=s).astype(np.float32) * m)
        for k, (s, m) in dict(
            Wp1=((3, C), 0.3), bp1=((C,), 0.1), Wp2=((C, C), 0.2),
            bp2=((C,), 0.1), W1=((C, G), 0.3), b1=((G,), 0.1),
            W2=((G, G), 0.4), b2=((G,), 0.1),
        ).items()
    }
    gp = jnp.ones(C) * 1.1
    bpv = jnp.zeros(C) + 0.05
    gw = jnp.ones(G) * 0.9
    bw = jnp.zeros(G) - 0.02
    wp = (P["W1"], P["b1"], gw, bw, P["W2"], P["b2"])
    return P, gp, bpv, wp


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(7)
    kf = rng.normal(size=(B, N, C)).astype(np.float32) * 0.5
    vf = rng.normal(size=(B, N, C)).astype(np.float32) * 0.5
    coord = rng.uniform(0, 4, (B, N, 3)).astype(np.float32)
    qf = rng.normal(size=(B, NP, C)).astype(np.float32) * 0.5
    qcoord = rng.uniform(0, 4, (B, NP, 3)).astype(np.float32)
    # every edge in-slab: query in kernel tile t' may reach sorted rows
    # [t'*TQ - W, t'*TQ + TQ + W)
    idx = np.zeros((B, NP, S), np.int64)
    for i in range(NP):
        t = i // TQ
        lo, hi = max(t * TQ - W, 0), min(t * TQ + TQ + W, N)
        idx[:, i] = rng.integers(lo, hi, (B, S))
    valid = (rng.random((B, NP, S)) < 0.9).astype(np.float32)
    valid[:, N:] = 0.0
    mask = (rng.random((B, NP)) < 0.95).astype(np.float32)
    mask[:, N:] = 0.0
    P, gp, bpv, wp = _params(rng)
    return dict(kf=kf, vf=vf, coord=coord, qf=qf, qcoord=qcoord, idx=idx,
                valid=valid, mask=mask, P=P, gp=gp, bpv=bpv, wp=wp)


@pytest.fixture(params=[False, True], ids=["packed", "split"])
def split_layout(request):
    """Run the parity tests in both slab row layouts (gs.lane_layout):
    the legacy packed [k|v|pos6] row and the split [k|pos6||v] row the
    C>=SPLIT_MIN_C stages use for narrow stats/pos/bwd-stats passes."""
    old = gs.SPLIT_MIN_C
    gs.SPLIT_MIN_C = 8 if request.param else 10_000
    yield request.param
    gs.SPLIT_MIN_C = old


def _build_inputs(case, kf, vf, qf):
    """Both paths' tensors from (possibly perturbed) f32 features."""
    bf = jnp.bfloat16
    c6 = gf.pack_coords(jnp.asarray(case["coord"]))
    src = jnp.concatenate([kf.astype(bf), vf.astype(bf), c6], axis=-1)
    lay = gs.lane_layout(C)
    if lay["split"]:
        KW = lay["KW"]
        zk = jnp.zeros(kf.shape[:-1] + (KW - C - 6,), bf)
        zv = jnp.zeros(kf.shape[:-1] + (lay["row_w"] - KW - C,), bf)
        slab_src = jnp.concatenate(
            [kf.astype(bf), c6, zk, vf.astype(bf), zv], axis=-1
        )
    else:
        slab_src = src
    qrow = jnp.concatenate(
        [
            qf.astype(bf),
            gf.pack_coords(jnp.asarray(case["qcoord"])),
            jnp.asarray(case["mask"], jnp.float32)[..., None].astype(bf),
        ],
        -1,
    )
    validb = jnp.asarray(case["valid"], jnp.float32).astype(bf)
    # gathered-path neighbour rows (pad src to NP rows for the gather)
    srcp = jnp.pad(src, ((0, 0), (0, NP - N), (0, 0)))
    flat = jnp.asarray(case["idx"].reshape(B, NP * S))
    kvp = jnp.take_along_axis(srcp, flat[..., None], axis=1)
    # slab-path tensors (layout per gs.lane_layout)
    kv_pad = gs.pad_for_slab(slab_src, N, TQ, J)
    idxp = jnp.asarray(case["idx"] + W, jnp.int32)
    return src, qrow, validb, kvp, kv_pad, idxp


def _fused_args(case, qrow, validb, kvp):
    P, gp, bpv, wp = case["P"], case["gp"], case["bpv"], case["wp"]
    return (kvp, qrow, validb, P["Wp1"], P["bp1"], gp, bpv, P["Wp2"],
            P["bp2"], wp)


def _slab_args(case, kv_pad, idxp, qrow, validb):
    P, gp, bpv, wp = case["P"], case["gp"], case["bpv"], case["wp"]
    return (kv_pad, idxp, qrow, validb, P["Wp1"], P["bp1"], gp, bpv,
            P["Wp2"], P["bp2"], wp)


def test_forward_stats_and_pos_parity(case, split_layout):
    """Same graph -> same output rows, weight-BN stats, pe-BN stats; both
    paths compute pos moments in-kernel (pos_moments=None)."""
    kf, vf, qf = (jnp.asarray(case[k]) for k in ("kf", "vf", "qf"))
    _, qrow, validb, kvp, kv_pad, idxp = _build_inputs(case, kf, vf, qf)
    ro, rsw, rsp = gf.gva_core(
        *_fused_args(case, qrow, validb, kvp), None, S, C, G, TQ, True
    )
    o, sw_, sp_ = gs.gva_slab_core(
        *_slab_args(case, kv_pad, idxp, qrow, validb), None,
        NP, S, C, G, TQ, J, True,
    )
    scale = float(jnp.max(jnp.abs(ro)))
    assert float(jnp.max(jnp.abs(o[:, :N] - ro[:, :N]))) < 5e-3 * max(
        scale, 1.0
    )
    assert float(jnp.abs(o[:, N:]).max()) == 0.0
    for a, b in zip(sw_[:2], rsw[:2]):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2
    for a, b in zip(sp_[:2], rsp[:2]):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2
    assert float(sw_[2]) == float(rsw[2])


def test_eval_mode_parity(case, split_layout):
    kf, vf, qf = (jnp.asarray(case[k]) for k in ("kf", "vf", "qf"))
    _, qrow, validb, kvp, kv_pad, idxp = _build_inputs(case, kf, vf, qf)
    _, rsw, rsp = gf.gva_core(
        *_fused_args(case, qrow, validb, kvp), None, S, C, G, TQ, True
    )
    rp, rw = (rsp[0], rsp[1]), (rsw[0], rsw[1])
    roe = gf.gva_core_eval(
        *_fused_args(case, qrow, validb, kvp), rp, rw, S, C, G, TQ, True
    )
    oe = gs.gva_slab_core_eval(
        *_slab_args(case, kv_pad, idxp, qrow, validb), rp, rw,
        NP, S, C, G, TQ, J, True,
    )
    scale = max(float(jnp.max(jnp.abs(roe))), 1.0)
    assert float(jnp.max(jnp.abs(oe[:, :N] - roe[:, :N]))) < 5e-3 * scale


def test_gradient_parity(case, split_layout):
    """d/d(src rows, q, params) must match the gathered path's autodiff-
    composed gather + hand-written kernel backward."""
    case_kf = jnp.asarray(case["kf"])
    case_vf = jnp.asarray(case["vf"])
    case_qf = jnp.asarray(case["qf"])
    cw = jnp.asarray(
        np.random.default_rng(3).normal(size=(G,)).astype(np.float32)
    )

    def head(out_tuple):
        out, (mu_w, var_w, _), _ = out_tuple
        return (
            jnp.sum(jnp.sin(out[:, :N]))
            + jnp.sum(mu_w * cw)
            + jnp.sum(var_w * cw * 0.5)
        )

    def loss_fused(kf, vf, qf, Wp1, W1, W2):
        c2 = dict(case, P=dict(case["P"], Wp1=Wp1))
        wp = (W1,) + case["wp"][1:4] + (W2, case["wp"][5])
        c2["wp"] = wp
        _, qrow, validb, kvp, _, _ = _build_inputs(c2, kf, vf, qf)
        return head(gf.gva_core(
            *_fused_args(c2, qrow, validb, kvp), None, S, C, G, TQ, True
        ))

    def loss_slab(kf, vf, qf, Wp1, W1, W2):
        c2 = dict(case, P=dict(case["P"], Wp1=Wp1))
        wp = (W1,) + case["wp"][1:4] + (W2, case["wp"][5])
        c2["wp"] = wp
        _, qrow, validb, _, kv_pad, idxp = _build_inputs(c2, kf, vf, qf)
        return head(gs.gva_slab_core(
            *_slab_args(c2, kv_pad, idxp, qrow, validb), None,
            NP, S, C, G, TQ, J, True,
        ))

    args = (case_kf, case_vf, case_qf, case["P"]["Wp1"], case["wp"][0],
            case["wp"][4])
    gref = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    gslab = jax.grad(loss_slab, argnums=tuple(range(6)))(*args)
    names = ["kf", "vf", "qf", "Wp1", "W1", "W2"]
    tol = dict(kf=0.08, vf=0.08, qf=0.08, Wp1=0.03, W1=0.03, W2=0.03)
    for nm, a, b in zip(names, gref, gslab):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        sc = max(np.abs(a).max(), 1e-5)
        rel = np.abs(a - b).max() / sc
        assert rel < tol[nm], (nm, rel, sc)


def test_forward_parity_large_row_ids(split_layout):
    """Index-transport exactness: with N=608 the W-padded global row ids
    reach 671 — far beyond bf16's 256 integer-exact range. The in-kernel
    gather must still hit exactly the right rows (the ids are split into
    block/offset components that each stay <= 256; a bf16 transport of
    the raw id rounds 257->256 etc. and silently gathers wrong rows)."""
    n, s, c, g, tq, j = 608, 8, 16, 4, 32, 3
    w = (j - 1) // 2 * tq
    np_ = -(-n // tq) * tq
    rng = np.random.default_rng(13)
    kf = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32) * 0.5)
    vf = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32) * 0.5)
    coord = rng.uniform(0, 4, (1, n, 3)).astype(np.float32)
    qf = jnp.asarray(rng.normal(size=(1, np_, c)).astype(np.float32) * 0.5)
    qcoord = rng.uniform(0, 4, (1, np_, 3)).astype(np.float32)
    idx = np.zeros((1, np_, s), np.int64)
    for i in range(np_):
        t = i // tq
        lo, hi = max(t * tq - w, 0), min(t * tq + tq + w, n)
        idx[:, i] = rng.integers(lo, hi, (1, s))
    valid = (rng.random((1, np_, s)) < 0.9).astype(np.float32)
    valid[:, n:] = 0.0
    mask = np.ones((1, np_), np.float32)
    mask[:, n:] = 0.0

    P = {
        k: jnp.asarray(rng.normal(size=sh).astype(np.float32) * m)
        for k, (sh, m) in dict(
            Wp1=((3, c), 0.3), bp1=((c,), 0.1), Wp2=((c, c), 0.2),
            bp2=((c,), 0.1), W1=((c, g), 0.3), b1=((g,), 0.1),
            W2=((g, g), 0.4), b2=((g,), 0.1),
        ).items()
    }
    gp, bpv = jnp.ones(c) * 1.1, jnp.zeros(c) + 0.05
    wp = (P["W1"], P["b1"], jnp.ones(g) * 0.9, jnp.zeros(g) - 0.02,
          P["W2"], P["b2"])

    bf = jnp.bfloat16
    c6 = gf.pack_coords(jnp.asarray(coord))
    src = jnp.concatenate([kf.astype(bf), vf.astype(bf), c6], axis=-1)
    lay = gs.lane_layout(c)
    if lay["split"]:
        kw = lay["KW"]
        zk = jnp.zeros(kf.shape[:-1] + (kw - c - 6,), bf)
        zv = jnp.zeros(kf.shape[:-1] + (lay["row_w"] - kw - c,), bf)
        slab_src = jnp.concatenate(
            [kf.astype(bf), c6, zk, vf.astype(bf), zv], axis=-1
        )
    else:
        slab_src = src
    qrow = jnp.concatenate(
        [qf.astype(bf), gf.pack_coords(jnp.asarray(qcoord)),
         jnp.asarray(mask)[..., None].astype(bf)], -1,
    )
    validb = jnp.asarray(valid).astype(bf)
    srcp = jnp.pad(src, ((0, 0), (0, np_ - n), (0, 0)))
    flat = jnp.asarray(idx.reshape(1, np_ * s))
    kvp = jnp.take_along_axis(srcp, flat[..., None], axis=1)
    kv_pad = gs.pad_for_slab(slab_src, n, tq, j)
    idxp = jnp.asarray(idx + w, jnp.int32)

    ro, rsw, _ = gf.gva_core(
        kvp, qrow, validb, P["Wp1"], P["bp1"], gp, bpv, P["Wp2"], P["bp2"],
        wp, None, s, c, g, tq, True,
    )
    o, sw_, _ = gs.gva_slab_core(
        kv_pad, idxp, qrow, validb, P["Wp1"], P["bp1"], gp, bpv, P["Wp2"],
        P["bp2"], wp, None, np_, s, c, g, tq, j, True,
    )
    scale = max(float(jnp.max(jnp.abs(ro))), 1.0)
    assert float(jnp.max(jnp.abs(o[:, :n] - ro[:, :n]))) < 5e-3 * scale
    for a, b in zip(sw_[:2], rsw[:2]):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_presorted_knn_edges_in_slab_and_topk():
    """knn_self_presorted: every returned edge must be inside the slab of
    the kernel tile covering its query, and must be the true k-nearest
    among the in-window candidates."""
    rng = np.random.default_rng(11)
    n, k = 300, 8
    tq, tile_q = 32, 32
    j = 5
    w = (j - 1) // 2 * tq  # 64
    window = 2 * w + 2 * tq - tile_q  # 160
    front = w - tile_q + tq  # 64
    coord = np.sort(rng.uniform(0, 10, (1, n, 1)), axis=1)
    coord = np.concatenate(
        [coord, rng.uniform(0, 0.5, (1, n, 2))], axis=-1
    ).astype(np.float32)
    mask = np.ones((1, n), bool)
    mask[:, -7:] = False
    idx, dist, valid = knn_self_presorted(
        jnp.asarray(coord), jnp.asarray(mask), k=k, tile_q=tile_q,
        window=window, front=front, exact_dist=True,
    )
    idx, dist, valid = map(np.asarray, (idx, dist, valid))
    nv = n - 7
    for i in range(nv):
        t = i // tq  # kernel tile
        slo, shi = t * tq - w, t * tq + tq + w
        kt = i // tile_q  # knn tile
        wlo = kt * tile_q - front
        whi = wlo + window
        cand = [
            jj for jj in range(max(wlo, 0), min(whi, nv))
        ]
        d = np.linalg.norm(coord[0, cand] - coord[0, i], axis=-1)
        best = np.sort(d)[:k]
        got = dist[0, i][valid[0, i]]
        assert np.all(valid[0, i][: len(got)])
        np.testing.assert_allclose(got, best[: len(got)], atol=1e-4)
        for s in range(k):
            if valid[0, i, s]:
                assert slo <= idx[0, i, s] < shi, (i, s, idx[0, i, s])
                assert idx[0, i, s] < nv
    # masked queries return no valid edges
    assert not valid[0, nv:].any()
    # self always first
    np.testing.assert_array_equal(idx[0, :nv, 0], np.arange(nv))


def test_presorted_knn_degenerate_window_is_exact():
    """window >= N + front falls back to the exact single-probe search."""
    rng = np.random.default_rng(5)
    n, k = 100, 6
    coord = rng.uniform(0, 3, (2, n, 3)).astype(np.float32)
    mask = np.ones((2, n), bool)
    idx, _, valid = knn_self_presorted(
        jnp.asarray(coord), jnp.asarray(mask), k=k, tile_q=32, window=512,
        front=128,
    )
    ref_idx, _, ref_valid = knn_self_spatial(
        jnp.asarray(coord), jnp.asarray(mask), k=k, probes=1
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))


@pytest.mark.slow
def test_blocksequence_slab_matches_gathered(monkeypatch):
    """End-to-end BlockSequence equivalence: with a slab wide enough that
    the window-restricted kNN covers the whole cloud (degenerate-exact),
    the slab path (Morton sort -> windowed kNN -> slab kernels -> unsort)
    must reproduce the gathered path's output on the same params."""
    import ao_tpu.models.point_transformer_v2.ptv2m2 as m

    n, tq, j = 256, 32, 15  # W = 224; slab covers [t*TQ-224, t*TQ+256)
    w = (j - 1) // 2 * tq
    geom = dict(TQ=tq, J=j, W=w, tile_q=32, window=2 * w + 2 * tq - 32,
                front=w - 32 + tq)
    rng = np.random.default_rng(0)
    coord = jnp.asarray(rng.uniform(0, 2, (2, n, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(2, n, 16)).astype(np.float32) * 0.5)
    mask = jnp.asarray(
        np.pad(np.ones((2, n - 20), bool), ((0, 0), (0, 20)))
    )
    seq = m.BlockSequence(depth=2, embed_channels=16, groups=4, neighbours=8)

    def run():
        params = seq.init(jax.random.PRNGKey(0), feat, coord, mask)
        out, _ = seq.apply(
            params, feat, coord, mask, mutable=["batch_stats"]
        )
        return np.asarray(out[0], np.float32)

    monkeypatch.setattr(m, "_slab_geometry", lambda *a: None)
    ref = run()

    monkeypatch.setattr(m, "_slab_geometry", lambda *a: dict(geom))
    for fn in ("gva_slab_core", "compute_pos_moments_slab",
               "gva_slab_core_eval"):
        orig = getattr(m._gvas, fn)
        monkeypatch.setattr(
            m._gvas, fn,
            functools.partial(
                lambda _orig, *a: _orig(*a, True), orig
            ),
        )
    got = run()
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() < 2e-2 * scale
