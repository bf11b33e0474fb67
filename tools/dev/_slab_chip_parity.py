"""On-chip slab-vs-gathered GVA parity probe.

The interpret-mode parity tests (tests/test_gva_slab.py) validate the
slab kernels' MATH on CPU; this probe validates their MOSAIC LOWERING on
the real TPU at the production stage shapes, against the gathered
gva_core path on the identical neighbour graph. Any disagreement beyond
bf16 tolerance here is a kernel bug, independent of the windowed-kNN
graph approximation.

Usage: python tools/dev/_slab_chip_parity.py [--grad]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.ops.pallas import gva_fused as gf
from ao_tpu.ops.pallas import gva_slab as gs

# production stages: (C, G, TQ, J) from ptv2m2._slab_geometry
STAGES = [
    (48, 6, 128, 9),
    (96, 12, 128, 9),
    (192, 24, 64, 17),
    (384, 48, 32, 17),
]
B, S = 1, 16


def build_case(C, G, TQ, J, N, seed=0):
    rng = np.random.default_rng(seed)
    W = (J - 1) // 2 * TQ
    NP = -(-N // TQ) * TQ
    kf = rng.normal(size=(B, N, C)).astype(np.float32) * 0.5
    vf = rng.normal(size=(B, N, C)).astype(np.float32) * 0.5
    coord = rng.uniform(0, 4, (B, N, 3)).astype(np.float32)
    qf = rng.normal(size=(B, NP, C)).astype(np.float32) * 0.5
    qcoord = rng.uniform(0, 4, (B, NP, 3)).astype(np.float32)
    # in-slab graph
    base = np.arange(NP)[:, None]
    t = base // TQ
    lo = np.maximum(t * TQ - W, 0)
    hi = np.minimum(t * TQ + TQ + W, N)
    idx = (lo + rng.integers(0, 1 << 30, (B, NP, S)) % (hi - lo)).astype(
        np.int64
    )
    valid = (rng.random((B, NP, S)) < 0.9).astype(np.float32)
    valid[:, N:] = 0.0
    mask = np.ones((B, NP), np.float32)
    mask[:, N:] = 0.0

    P = {
        k: jnp.asarray(rng.normal(size=sh).astype(np.float32) * m)
        for k, (sh, m) in dict(
            Wp1=((3, C), 0.3), bp1=((C,), 0.1), Wp2=((C, C), 0.2),
            bp2=((C,), 0.1), W1=((C, G), 0.3), b1=((G,), 0.1),
            W2=((G, G), 0.4), b2=((G,), 0.1),
        ).items()
    }
    gp, bpv = jnp.ones(C) * 1.1, jnp.zeros(C) + 0.05
    wp = (P["W1"], P["b1"], jnp.ones(G) * 0.9, jnp.zeros(G) - 0.02,
          P["W2"], P["b2"])

    bf = jnp.bfloat16
    c6 = gf.pack_coords(jnp.asarray(coord))
    src = jnp.concatenate([jnp.asarray(kf, bf), jnp.asarray(vf, bf), c6], -1)
    lay = gs.lane_layout(C)
    if lay["split"]:
        KW = lay["KW"]
        zk = jnp.zeros(kf.shape[:-1] + (KW - C - 6,), bf)
        zv = jnp.zeros(kf.shape[:-1] + (lay["row_w"] - KW - C,), bf)
        parts = [jnp.asarray(kf, bf), c6, zk, jnp.asarray(vf, bf), zv]
        slab_src = jnp.concatenate([p for p in parts if p.shape[-1]], -1)
    else:
        slab_src = src
    qrow = jnp.concatenate(
        [jnp.asarray(qf, bf), gf.pack_coords(jnp.asarray(qcoord)),
         jnp.asarray(mask)[..., None].astype(bf)], -1,
    )
    validb = jnp.asarray(valid).astype(bf)
    srcp = jnp.pad(src, ((0, 0), (0, NP - N), (0, 0)))
    flat = jnp.asarray(idx.reshape(B, NP * S))
    kvp = jnp.take_along_axis(srcp, flat[..., None], axis=1)
    kv_pad = gs.pad_for_slab(slab_src, N, TQ, J)
    idxp = jnp.asarray(idx + W, jnp.int32)
    return dict(P=P, gp=gp, bpv=bpv, wp=wp, qrow=qrow, validb=validb,
                kvp=kvp, kv_pad=kv_pad, idxp=idxp, N=N, NP=NP)


def run_stage(C, G, TQ, J, N, grad=False):
    c = build_case(C, G, TQ, J, N)
    P, gp, bpv, wp = c["P"], c["gp"], c["bpv"], c["wp"]
    NP = c["NP"]

    @jax.jit
    def fused(kvp, qrow, validb):
        return gf.gva_core(kvp, qrow, validb, P["Wp1"], P["bp1"], gp, bpv,
                           P["Wp2"], P["bp2"], wp, None, S, C, G, TQ)

    @jax.jit
    def slab(kv_pad, idxp, qrow, validb):
        return gs.gva_slab_core(kv_pad, idxp, qrow, validb, P["Wp1"],
                                P["bp1"], gp, bpv, P["Wp2"], P["bp2"], wp,
                                None, NP, S, C, G, TQ, J)

    ro, rsw, rsp = fused(c["kvp"], c["qrow"], c["validb"])
    o, sw_, sp_ = slab(c["kv_pad"], c["idxp"], c["qrow"], c["validb"])
    ro, o = np.asarray(ro, np.float32), np.asarray(o, np.float32)
    scale = max(np.abs(ro).max(), 1.0)
    d_out = np.abs(o[:, :N] - ro[:, :N]).max() / scale
    d_mu = float(jnp.abs(sw_[0] - rsw[0]).max())
    d_var = float(jnp.abs(sw_[1] - rsw[1]).max())
    print(f"C={C:4d} G={G:3d} TQ={TQ:4d} J={J:3d} N={N}: "
          f"fwd rel-delta {d_out:.2e}  mu {d_mu:.2e}  var {d_var:.2e}")

    if grad:
        cw = jnp.asarray(np.random.default_rng(3).normal(size=(G,)), jnp.float32)

        def head(t):
            out, (mu, var, _), _ = t
            return (jnp.sum(jnp.sin(out[:, :N])) + jnp.sum(mu * cw)
                    + jnp.sum(var * cw * 0.5))

        gr = jax.jit(jax.grad(
            lambda kvp: head(gf.gva_core(
                kvp, c["qrow"], c["validb"], P["Wp1"], P["bp1"], gp, bpv,
                P["Wp2"], P["bp2"], wp, None, S, C, G, TQ))
        ))(c["kvp"])
        gsl = jax.jit(jax.grad(
            lambda kv: head(gs.gva_slab_core(
                kv, c["idxp"], c["qrow"], c["validb"], P["Wp1"], P["bp1"],
                gp, bpv, P["Wp2"], P["bp2"], wp, None, NP, S, C, G, TQ, J))
        ))(c["kv_pad"])
        # compare total dL/d(row r) by summing slab grads back to rows
        B_, TJ, _, rw = gsl.shape
        W = (J - 1) // 2 * TQ
        rows = np.asarray(gsl, np.float32).reshape(B_, TJ * TQ, rw)[
            :, W : W + N
        ]
        # gathered-path grads scatter to rows via the same idx
        gref = np.zeros_like(rows[..., :1]).repeat(rw, -1) * 0
        lay = gs.lane_layout(C)
        gr_np = np.asarray(gr, np.float32)  # (B, NP*S, 2C+6)
        idx = np.asarray(c["idxp"], np.int64) - W
        gref = np.zeros((B_, N + 1, rw), np.float32)
        tgt = np.clip(idx.reshape(B_, -1), 0, N)
        for b in range(B_):
            if lay["split"]:
                KW = lay["KW"]
                exp = np.zeros((gr_np.shape[1], rw), np.float32)
                exp[:, :C] = gr_np[b, :, :C]
                exp[:, C:C + 6] = gr_np[b, :, 2 * C:]
                exp[:, KW:KW + C] = gr_np[b, :, C:2 * C]
            else:
                exp = np.zeros((gr_np.shape[1], rw), np.float32)
                exp[:, :2 * C + 6] = gr_np[b]
            np.add.at(gref, (b, tgt[b]), exp)
        gref = gref[:, :N]
        sc = max(np.abs(gref).max(), 1e-5)
        print(f"    dkv rel-delta {np.abs(rows - gref).max() / sc:.2e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--n", type=int, default=4096)
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    for C, G, TQ, J in STAGES:
        run_stage(C, G, TQ, J, args.n, grad=args.grad)


if __name__ == "__main__":
    main()
