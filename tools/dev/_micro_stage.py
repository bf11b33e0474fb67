"""Per-component microbench of the PT-v2m2 hot path at each stage config.

Times, per stage (B=3): the kvp gather (grouping fwd), its scatter-add
backward, gva_core forward, gva_core backward, and the kNN. Host-transfer
sync (axon: block_until_ready is a no-op).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from ao_tpu.ops import grouping, knn_self_spatial
from ao_tpu.ops.pallas import gva_fused as g

B = 3
STAGES = [
    # (name, N, C, G, S, TQ)  — TQ mirrors ptv2m2.py:194
    ("patch", 81920, 48, 6, 8, 64),
    ("dec0", 81920, 48, 6, 16, 64),
    ("enc1", 28672, 96, 12, 16, 64),
    ("enc2", 10035, 192, 24, 16, 32),
    ("enc3", 3512, 384, 48, 16, 32),
    ("enc4", 1229, 512, 64, 16, 32),
]


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel())[:1]


def timeit(fn, *args, n=6):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n * 1e3  # ms


def stage_bench(name, N, C, G, S, TQ):
    rng = np.random.RandomState(0)
    Np = -(-N // TQ) * TQ
    coord = jnp.asarray(rng.rand(B, Np, 3) * 10, jnp.float32)
    feat_src = jnp.asarray(rng.rand(B, Np, 2 * C + 6), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (B, Np, S)), jnp.int32)
    valid = jnp.ones((B, Np, S), jnp.bfloat16)
    mask = jnp.ones((B, Np), bool)

    res = {}
    # 1. gather fwd
    gather = jax.jit(lambda s, i: grouping(s, i))
    res["gather_fwd"] = timeit(gather, feat_src, idx)
    # 2. gather bwd (scatter-add)
    gvjp = jax.jit(
        lambda s, i: jax.grad(
            lambda ss: jnp.sum(grouping(ss, i).astype(jnp.float32))
        )(s)
    )
    res["gather_bwd"] = timeit(gvjp, feat_src, idx)

    # 3. gva fwd / bwd
    kvp = gather(feat_src, idx).reshape(B, Np * S, 2 * C + 6)
    qrow = jnp.asarray(rng.rand(B, Np, C + 7), jnp.bfloat16)
    Wp1 = jnp.asarray(rng.rand(3, C), jnp.float32)
    bp1 = jnp.zeros(C); gp = jnp.ones(C); bp = jnp.zeros(C)
    Wp2 = jnp.asarray(rng.rand(C, C) * 0.1, jnp.float32)
    bp2 = jnp.zeros(C)
    wparams = (
        jnp.asarray(rng.rand(C, G) * 0.1, jnp.float32), jnp.zeros(G),
        jnp.ones(G), jnp.zeros(G),
        jnp.asarray(rng.rand(G, G) * 0.1, jnp.float32), jnp.zeros(G),
    )

    pm = jax.jit(
        functools.partial(g.compute_pos_moments, S=S, C=C, G=G, TQ=TQ)
    )
    res["pos_pass"] = timeit(pm, kvp, qrow, valid)
    pmv = pm(kvp, qrow, valid)

    fwd = jax.jit(
        lambda *a: g.gva_core(*a, S, C, G, TQ)[0]
    )
    args = (kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams, pmv)
    res["gva_fwd"] = timeit(fwd, *args)

    @jax.jit
    def bwd(kv, qr):
        return jax.grad(
            lambda kv_, qr_: jnp.sum(
                g.gva_core(kv_, qr_, valid, Wp1, bp1, gp, bp, Wp2, bp2,
                           wparams, pmv, S, C, G, TQ)[0]
            ),
            argnums=(0, 1),
        )(kv, qr)

    res["gva_bwd"] = timeit(bwd, kvp, qrow)

    # 4. kNN (self) as the model calls it
    knn = jax.jit(
        functools.partial(knn_self_spatial, k=S, exact_dist=False)
    )
    res["knn"] = timeit(knn, coord, mask)

    print(f"{name:6s} N={N:6d} C={C:3d} S={S:2d} | " + " ".join(
        f"{k}={v:7.2f}ms" for k, v in res.items()
    ), flush=True)
    return res


if __name__ == "__main__":
    totals = {}
    # block multiplicity per stage in the full model fwd+bwd step
    mult = {"patch": 1, "dec0": 1, "enc1": 3, "enc2": 3, "enc3": 7, "enc4": 2}
    for cfg in STAGES:
        r = stage_bench(*cfg)
        m = mult[cfg[0]]
        for k, v in r.items():
            totals[k] = totals.get(k, 0.0) + v * (1 if k == "knn" else m)
    print("weighted totals (fwd-only components x blocks):", {
        k: round(v, 1) for k, v in totals.items()
    })
