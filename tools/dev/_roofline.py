"""Roofline analysis of the flagship jitted train step on the real chip.

VERDICT r4 "Next round #3": pin the perf ceiling — is 1.37x vs the A100
baseline near the hardware limit, or is headroom left?  This script
compiles the exact bench.py train step (B=3, N=81920 and N=40960),
pulls XLA's compiled cost analysis (FLOPs + HBM bytes accessed), times
the warm step with a host sync (axon does not block on
block_until_ready), and reports:

  * achieved TFLOP/s vs v5e peak (197 TFLOP/s bf16)  -> MFU
  * achieved HBM GB/s vs v5e peak (819 GB/s)         -> BW utilisation
  * roofline-implied minimum step time = max(flops/peak, bytes/bw)
  * headroom multiple = measured / roofline-min

Reference hot loop being modelled:
/root/reference/pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py:48-269
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
STEPS = 8


def build_step(batch, num_points):
    import jax
    import optax

    from ao_tpu.models import build_criteria, build_model
    from __graft_entry__ import _example_batch, _flagship_cfg

    model = build_model(_flagship_cfg(tiny=False))
    criteria = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
    tx = optax.adamw(6e-3, weight_decay=0.05)

    coord, feat, mask, segment = _example_batch(batch, num_points)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, coord, feat, mask
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = jax.jit(tx.init)(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                coord, feat, mask, False, False,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return criteria(logits, segment, mask), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    return train_step, (params, batch_stats, opt_state)


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def analyze(batch, num_points):
    import jax

    train_step, (params, batch_stats, opt_state) = build_step(batch, num_points)
    rng = jax.random.PRNGKey(1)

    lowered = train_step.lower(params, batch_stats, opt_state, rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))

    # warm + measure
    params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, rng)
    sync(loss)
    t0 = time.time()
    for _ in range(STEPS):
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, rng)
    sync(loss)
    dt = (time.time() - t0) / STEPS

    t_flops = flops / (V5E_PEAK_BF16_TFLOPS * 1e12)
    t_bytes = byt / (V5E_HBM_GBPS * 1e9)
    roofline_min = max(t_flops, t_bytes)
    out = {
        "geometry": f"B={batch} N={num_points}",
        "step_ms": round(dt * 1e3, 1),
        "scenes_per_sec": round(batch / dt, 3),
        "xla_tflops_per_step": round(flops / 1e12, 3),
        "xla_hbm_gb_per_step": round(byt / 1e9, 3),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / (V5E_PEAK_BF16_TFLOPS * 1e12), 1),
        "achieved_hbm_gbps": round(byt / dt / 1e9, 1),
        "hbm_util_pct": round(100 * byt / dt / (V5E_HBM_GBPS * 1e9), 1),
        "roofline_min_ms_flops": round(t_flops * 1e3, 1),
        "roofline_min_ms_bytes": round(t_bytes * 1e3, 1),
        "roofline_min_step_ms": round(roofline_min * 1e3, 1),
        "headroom_x": round(dt / roofline_min, 2) if roofline_min > 0 else None,
        "bound": "hbm" if t_bytes > t_flops else "mxu",
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    cache_dir = os.environ.get("AO_COMPILE_CACHE", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    analyze(3, 81920)
    if not os.environ.get("AO_ROOFLINE_SKIP_40K"):
        analyze(3, 40960)


if __name__ == "__main__":
    main()
