"""One-off: instantiate SAM at REAL ViT-H scale on the chip.

Jits the full vit_h (1280 x 32 layers, 632M-param encoder) image encoder
on a 1024^2 frame and the prompt decoder on a point batch, and reports
embedding throughput (frames/sec) for the PP2S stage-1 budget
(reference: pointcept/utils/my_decode_embedding_final.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from ao_tpu.models.sam.modeling import SamConfig, SamModel
from ao_tpu.models.sam.predictor import SamPredictor


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel())[:1]


def main():
    cfg = SamConfig.vit_h()
    model = SamModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    t0 = time.time()
    params = jax.jit(
        lambda r: model.init(r, x, method=model.get_image_embeddings)
    )(rng)
    n_params = sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)
    )
    print(f"init: {time.time()-t0:.1f}s, params={n_params/1e6:.1f}M",
          flush=True)

    embed = jax.jit(
        lambda v, im: model.apply(v, im, method=model.get_image_embeddings)
    )
    emb = embed(params, x)
    sync(emb)
    print("embedding shape:", jax.tree_util.tree_leaves(emb)[0].shape,
          flush=True)
    t0 = time.time()
    N = 4
    for _ in range(N):
        emb = embed(params, x)
    sync(emb)
    dt = (time.time() - t0) / N
    print(f"encoder: {dt*1e3:.0f} ms/frame => {1/dt:.2f} frames/sec",
          flush=True)

    # prompt decoder on cached embedding (REAL-loop shape: many points);
    # params above hold only the encoder (init via get_image_embeddings) -
    # let the predictor deterministically init the full model for the
    # decoder half
    pred = SamPredictor(cfg, None)
    pred.set_features(np.asarray(jax.tree_util.tree_leaves(emb)[0]),
                      (1080, 1080))
    pts = np.asarray(
        np.random.RandomState(0).rand(16, 1, 2) * 1080, np.float32
    )
    lbl = np.ones((16, 1), np.int32)
    masks, scores, _ = pred.predict(pts, lbl)
    t0 = time.time()
    for _ in range(4):
        masks, scores, _ = pred.predict(pts, lbl)
    np.asarray(masks).ravel()[:1]
    dt = (time.time() - t0) / 4
    print(f"decoder: {dt*1e3:.0f} ms / 16-prompt batch "
          f"({masks.shape}); {16/dt:.0f} prompts/sec", flush=True)


if __name__ == "__main__":
    main()
