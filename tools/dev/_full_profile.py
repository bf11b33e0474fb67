"""Decompose the bench step: time each suspect component at bench shapes.

Components: morton sort + 2 argsorts + 3 permutation gathers (per slab
stage), presorted kNN at both geometries, grid pooling, unpool, and the
full model fwd vs fwd+bwd.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from ao_tpu.ops.knn_spatial import knn_self_presorted, knn_self_spatial, morton_code

B, N = 3, 81920


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(name, fn, *args, reps=10):
    o = fn(*args)
    sync(o)
    t0 = time.time()
    for _ in range(reps):
        o = fn(*args)
    sync(o)
    print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)


rng = np.random.default_rng(0)
coord = jnp.asarray(rng.uniform(0, 30, (B, N, 3)).astype(np.float32))
mask = jnp.asarray(np.ones((B, N), bool))
feat = jnp.asarray(rng.normal(size=(B, N, 48)).astype(np.float32))


@jax.jit
def sort_pipeline(coord, mask, feat):
    code = morton_code(coord, mask)
    order = jnp.argsort(code, axis=1)
    inv = jnp.argsort(order, axis=1)
    cs = jnp.take_along_axis(coord, order[..., None], axis=1)
    fs = jnp.take_along_axis(feat, order[..., None], axis=1)
    fu = jnp.take_along_axis(fs, inv[..., None], axis=1)
    return cs, fu


bench("sort+2argsort+3perm (81920, C=48)", sort_pipeline, coord, mask, feat)

cs = jnp.take_along_axis(
    coord, jnp.argsort(morton_code(coord, mask), axis=1)[..., None], axis=1
)


def knn_a(c, m):
    return knn_self_presorted(c, m, k=8, tile_q=128, window=1152, front=512)


def knn_b(c, m):
    return knn_self_presorted(c, m, k=16, tile_q=128, window=1024, front=448)


bench("presorted kNN k=8 w=1152 (patch)", knn_a, cs, mask)
bench("presorted kNN k=16 w=1024 (dec0)", knn_b, cs, mask)


def knn_old(c, m):
    return knn_self_spatial(c, m, k=16)


bench("multi-probe kNN k=16 (old path)", knn_old, coord, mask)

# enc1 resolution
N1 = 28672
c1 = jnp.asarray(rng.uniform(0, 30, (B, N1, 3)).astype(np.float32))
m1 = jnp.asarray(np.ones((B, N1), bool))
c1s = jnp.take_along_axis(
    c1, jnp.argsort(morton_code(c1, m1), axis=1)[..., None], axis=1
)
bench("presorted kNN k=16 (enc1)", knn_b, c1s, m1)

# full model fwd / fwd+bwd at bench shapes
from __graft_entry__ import _example_batch, _flagship_cfg
from ao_tpu.models import build_criteria, build_model

model = build_model(_flagship_cfg(tiny=False))
criteria = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
coord_b, feat_b, mask_b, segment = _example_batch(B, N)
variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)}, coord_b, feat_b, mask_b
)
params, batch_stats = variables["params"], variables.get("batch_stats", {})


@jax.jit
def fwd(params, batch_stats):
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        coord_b, feat_b, mask_b, False, False,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
    )
    return logits


bench("model fwd", fwd, params, batch_stats, reps=5)


@jax.jit
def fwdbwd(params, batch_stats):
    def loss_fn(p):
        logits, mut = model.apply(
            {"params": p, "batch_stats": batch_stats},
            coord_b, feat_b, mask_b, False, False,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return criteria(logits, segment, mask_b), mut["batch_stats"]

    (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads


bench("model fwd+bwd", fwdbwd, params, batch_stats, reps=5)
