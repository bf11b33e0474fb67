"""Capture a profiler trace of the bench fwd+bwd step and print the
top device ops by self-time (parsed from the xplane via the
tensorboard profile plugin)."""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from __graft_entry__ import _example_batch, _flagship_cfg
from ao_tpu.models import build_criteria, build_model

B, N = 3, 81920


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


model = build_model(_flagship_cfg(tiny=False))
criteria = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
coord_b, feat_b, mask_b, segment = _example_batch(B, N)
variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)}, coord_b, feat_b, mask_b
)
params, batch_stats = variables["params"], variables.get("batch_stats", {})


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


o = fwdbwd(params, batch_stats)
sync(o)
o = fwdbwd(params, batch_stats)
sync(o)

logdir = "/tmp/jax_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        o = fwdbwd(params, batch_stats)
    sync(o)

xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", xs, flush=True)
if not xs:
    sys.exit("no xplane captured")

from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(xs, "hlo_stats", {})
import gzip
import json

out = "/tmp/hlo_stats.json"
with open(out, "w") as f:
    f.write(data if isinstance(data, str) else data.decode())
print("wrote", out, flush=True)
