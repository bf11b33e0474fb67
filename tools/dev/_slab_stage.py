"""Compile + time ONE slab-GVA stage on the chip (bisect for bench).

Usage: python _slab_stage.py [stage] where stage in {patch, dec0, enc1}.
Times compile wall-clock and steady-state fwd / fwd+bwd.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
jax.config.update("jax_compilation_cache_dir", os.environ.get("AO_COMPILE_CACHE", "/root/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from ao_tpu.models.point_transformer_v2.ptv2m2 import _slab_geometry
from ao_tpu.ops.pallas import gva_fused as gf
from ao_tpu.ops.pallas import gva_slab as gs

B = 3
STAGES = {
    "patch": (81920, 48, 6, 8),
    "dec0": (81920, 48, 6, 16),
    "enc1": (28672, 96, 12, 16),
}


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "patch"
    N, C, G, S = STAGES[name]
    geom = _slab_geometry(C, N, S)
    print(name, geom, flush=True)
    TQ, J, W = geom["TQ"], geom["J"], geom["W"]
    if len(sys.argv) > 3:  # override: _slab_stage.py dec0 TQ J
        TQ, J = int(sys.argv[2]), int(sys.argv[3])
        W = (J - 1) // 2 * TQ
        print(f"override TQ={TQ} J={J} W={W}", flush=True)
    rng = np.random.default_rng(0)
    lay = gs.lane_layout(C)
    rw = lay["row_w"]
    Np = -(-N // TQ) * TQ
    src = jnp.asarray(rng.normal(size=(B, N, rw)).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    if lay["split"]:
        # zero the pad lanes like the model's concat does
        src = src.at[:, :, C + 6:lay["KW"]].set(0).at[:, :, lay["KW"] + C:].set(0)
    kv_pad = gs.pad_for_slab(src, N, TQ, J)
    idx = np.zeros((B, Np, S), np.int64)
    for i in range(Np):
        t = i // TQ
        lo, hi = max(t * TQ - W, 0), min(t * TQ + TQ + W, N)
        idx[:, i] = rng.integers(lo, hi, (B, S))
    idxp = jnp.asarray(idx + W, jnp.int32)
    qrow = jnp.asarray(
        rng.normal(size=(B, Np, C + 7)).astype(np.float32) * 0.3, jnp.bfloat16
    )
    valid = jnp.asarray(
        (rng.random((B, Np, S)) < 0.95).astype(np.float32), jnp.bfloat16
    )
    P = {
        k: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
        for k, s in dict(
            Wp1=(3, C), bp1=(C,), gp=(C,), bp=(C,), Wp2=(C, C), bp2=(C,),
            W1=(C, G), b1=(G,), gw=(G,), bw=(G,), W2=(G, G), b2=(G,),
        ).items()
    }
    wp = (P["W1"], P["b1"], P["gw"], P["bw"], P["W2"], P["b2"])

    def fwd(kv_pad, qrow, P, wp):
        out, _, _ = gs.gva_slab_core(
            kv_pad, idxp, qrow, valid, P["Wp1"], P["bp1"], P["gp"], P["bp"],
            P["Wp2"], P["bp2"], wp, None, Np, S, C, G, TQ, J,
        )
        return out

    def loss(kv_pad, qrow, P, wp):
        return jnp.sum(fwd(kv_pad, qrow, P, wp) ** 2)

    jf = jax.jit(fwd)
    t0 = time.time()
    o = jf(kv_pad, qrow, P, wp)
    sync(o)
    print(f"fwd compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    R = 10
    for _ in range(R):
        o = jf(kv_pad, qrow, P, wp)
    sync(o)
    print(f"fwd: {(time.time()-t0)/R*1e3:.1f} ms", flush=True)

    jg = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    t0 = time.time()
    g = jg(kv_pad, qrow, P, wp)
    sync(g)
    print(f"fwd+bwd compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(R):
        g = jg(kv_pad, qrow, P, wp)
    sync(g)
    print(f"fwd+bwd: {(time.time()-t0)/R*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
