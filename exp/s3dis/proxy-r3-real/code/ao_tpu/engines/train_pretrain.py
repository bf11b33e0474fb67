"""Self-supervised pretraining trainer (MSC).

The MSC model consumes two augmented views per scene (the
ContrastiveViewsGenerator transform's view1_*/view2_* keys) and returns a
loss dict; everything else (mesh sharding, hooks, checkpoints) is the
standard trainer. Mirrors the reference's use of the plain Trainer with
the MSC model (reference: configs/scannet/pretrain-msc-v1m1-0-spunet-base.py).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .train import Trainer

_VIEW_KEYS = (
    "view1_origin_coord", "view1_coord", "view1_feat",
    "view2_origin_coord", "view2_coord", "view2_feat",
    "view1_color", "view1_normal", "view2_color", "view2_normal",
)


class PretrainTrainer(Trainer):
    """Trainer whose step feeds two views into an MSC-style model."""

    def build_val_loader(self):
        return None  # pretraining has no per-epoch evaluation

    def make_train_step(self):
        model, tx = self.model, self.tx

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            r1, r2 = jax.random.split(rng)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["view1_origin_coord"], batch["view1_coord"],
                    batch["view1_feat"], batch["view1_mask"],
                    batch["view2_origin_coord"], batch["view2_coord"],
                    batch["view2_feat"], batch["view2_mask"],
                    batch.get("view1_color"), batch.get("view1_normal"),
                    batch.get("view2_color"), batch.get("view2_normal"),
                    False, False,
                    mutable=["batch_stats"],
                    rngs={"dropout": r1, "mask": r2},
                )
                return out["loss"], (mut["batch_stats"], out)

            (loss, (new_bs, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt,
            )
            return new_state, out

        return train_step

    def make_eval_step(self):
        return None

    def put_batch(self, batch: dict) -> dict:
        """Like Trainer.put_batch but keyed on view1_mask (pretrain batches
        carry per-view masks, no global ``mask``)."""
        n_dev = self.mesh.devices.size
        b = batch["view1_mask"].shape[0]
        pad = (-b) % n_dev
        sharding = NamedSharding(self.mesh, P("data"))
        out = {}
        for k, v in batch.items():
            if k == "extras":
                continue
            if pad:
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                )
            out[k] = jax.device_put(v, sharding)
        return out

    def _collate(self, samples):
        """Pad each view independently (views have different point counts)."""
        from ao_tpu.datasets.collate import pad_to, _ceil_to

        pad_multiple = self.cfg.get("pad_multiple", 4096)
        out = {}
        for view in ("view1", "view2"):
            counts = [s[f"{view}_coord"].shape[0] for s in samples]
            n_max = _ceil_to(max(counts), pad_multiple)
            mask = np.zeros((len(samples), n_max), bool)
            for i, c in enumerate(counts):
                mask[i, :c] = True
            out[f"{view}_mask"] = mask
            for key in samples[0]:
                if not key.startswith(view + "_"):
                    continue
                arrs = [np.asarray(s[key], np.float32) for s in samples]
                if arrs[0].ndim >= 1 and arrs[0].shape[0] == counts[0]:
                    out[key] = np.stack(
                        [pad_to(a[:n_max], n_max) for a in arrs]
                    )
        return out

    def build_state(self):
        batch = self._example_batch()
        batch = self.put_batch(batch)
        variables = jax.jit(self.model.init)(
            {"params": self.rng_key, "mask": self.rng_key,
             "dropout": self.rng_key},
            batch["view1_origin_coord"], batch["view1_coord"],
            batch["view1_feat"], batch["view1_mask"],
            batch["view2_origin_coord"], batch["view2_coord"],
            batch["view2_feat"], batch["view2_mask"],
            batch.get("view1_color"), batch.get("view1_normal"),
            batch.get("view2_color"), batch.get("view2_normal"),
        )
        import jax.numpy as jnp

        from .train import TrainState

        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=jax.jit(self.tx.init)(params),
        )
