"""Training engine.

TPU-native re-design of the reference trainer
(reference: pointcept/engines/train.py:34-286). The hook-driven epoch/step
lifecycle is preserved, but the hot loop is a single jitted
``train_step(state, batch, rng) -> (state, metrics)`` compiled over a
``jax.sharding.Mesh``:

* data parallelism = batch axis sharded over the ``data`` mesh axis; XLA
  inserts the gradient all-reduce (the reference's DDP/NCCL allreduce,
  launch.py:107) and the masked batch-norm statistics automatically become
  globally synchronised (the reference's SyncBN, train.py:204).
* AMP: matmuls already run bf16 on the MXU by default (the f32 default
  matmul precision), which is where the reference's torch.cuda.amp wins
  live; parameters and reductions stay f32.
* state is a pytree (params, batch_stats, opt_state, step) checkpointed
  with atomic best/last semantics.
"""

from __future__ import annotations

import os
import sys
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ao_tpu.datasets import build_dataset, point_collate_fn, collate_fn
from ao_tpu.datasets.loader import DataLoader, ShardedSampler
from ao_tpu.models import build_criteria, build_model
from ao_tpu.models.default import _accepts_category
from ao_tpu.utils import EventStorage, TensorboardWriter, get_root_logger, set_seed
from ao_tpu.utils.misc import intersection_and_union_jax
from ao_tpu.utils.optimizer import build_optimizer, lr_at_step

from .hooks import HookBase, build_hooks



def _category_kwargs(model, batch):
    """Part-seg backbones condition on the shape class: pass it through
    when the batch carries BOTH a segment target and a category input (for
    classification batches `category` is the target, never an input)."""
    if (
        "category" in batch
        and "segment" in batch
        and _accepts_category(model)
    ):
        return {"category": batch["category"]}
    return {}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class TrainerBase:
    """Hook lifecycle (reference: train.py:34-111)."""

    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info: Dict[str, Any] = {}
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks_cfg):
        hooks = build_hooks(hooks_cfg)
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = self
        self.hooks = hooks

    def before_train(self):
        for h in self.hooks:
            h.before_train()

    def before_epoch(self):
        for h in self.hooks:
            h.before_epoch()

    def before_step(self):
        for h in self.hooks:
            h.before_step()

    def after_step(self):
        for h in self.hooks:
            h.after_step()

    def after_epoch(self):
        for h in self.hooks:
            h.after_epoch()
        self.storage._latest_scalars = {}

    def after_train(self):
        if "current_metric_value" in self.comm_info and (
            self.comm_info["current_metric_value"] > self.best_metric_value
        ):
            self.best_metric_value = self.comm_info["current_metric_value"]
        for h in self.hooks:
            h.after_train()

    def train(self):
        with EventStorage() as self.storage:
            self.before_train()
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.run_epoch()
                self.after_epoch()
            self.after_train()

    def run_epoch(self):
        raise NotImplementedError


class Trainer(TrainerBase):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = cfg.eval_epoch
        self.best_metric_value = -1e9
        self.save_path = cfg.save_path
        os.makedirs(os.path.join(self.save_path, "model"), exist_ok=True)
        self.logger = get_root_logger(
            log_file=os.path.join(self.save_path, "train.log")
        )
        self.logger.info(f"Save path: {self.save_path}")
        self.logger.info(f"Config:\n{cfg.dump()}")

        self.seed, self.rng_key = set_seed(cfg.get("seed"))
        self.is_main_process = jax.process_index() == 0
        self.mesh = self.build_mesh()
        self.logger.info(
            f"Devices: {jax.device_count()} "
            f"(local {jax.local_device_count()}), mesh: {self.mesh}"
        )

        self.logger.info("=> Building model ...")
        self.model = build_model(dict(cfg.model))
        self.criteria = build_criteria(cfg.model.get("criteria", []))
        self.logger.info("=> Building train/val datasets & loaders ...")
        self.train_loader = self.build_train_loader()
        self.val_loader = self.build_val_loader()
        self.logger.info("=> Building optimizer & scheduler ...")
        self.total_steps = len(self.train_loader) * self.max_epoch
        self.tx = build_optimizer(
            dict(cfg.optimizer),
            params=None,
            scheduler_cfg=dict(cfg.scheduler),
            total_steps=self.total_steps,
        )
        self.logger.info("=> Initializing model state (jitted) ...")
        self.state = self.build_state()
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(self.state.params)
        )
        self.logger.info(f"Num params: {n_params}")
        self._train_step = self.make_train_step()
        self._eval_step = self.make_eval_step()
        self.writer = (
            TensorboardWriter(self.save_path) if self.is_main_process else None
        )
        self.register_hooks(cfg.get("hooks"))

    # ---- construction ----
    def build_mesh(self) -> Mesh:
        devices = np.asarray(jax.devices())
        return Mesh(devices.reshape(-1), ("data",))

    def _example_batch(self):
        it = iter(self.train_loader)
        batch = next(it)
        return batch

    def _collate(self, samples):
        return point_collate_fn(
            samples,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            pad_multiple=self.cfg.get("pad_multiple", 4096),
            max_points=self.cfg.get("max_points"),
            ignore_index=self.cfg.data.get("ignore_index", -1),
        )

    def _collate_val(self, samples):
        return collate_fn(
            samples,
            pad_multiple=self.cfg.get("pad_multiple", 4096),
            max_points=self.cfg.get("max_points"),
            ignore_index=self.cfg.data.get("ignore_index", -1),
        )

    def build_train_loader(self):
        dataset = build_dataset(self.cfg.data.train)
        batch_size = self.cfg.batch_size // jax.process_count()
        sampler = ShardedSampler(
            len(dataset),
            shuffle=True,
            seed=self.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
            drop_last=True,
        )
        return DataLoader(
            dataset,
            batch_size=batch_size,
            sampler=sampler,
            collate_fn=self._collate,
            num_workers=self.cfg.get("num_worker", 8) // max(jax.process_count(), 1),
            drop_last=True,
        )

    def build_val_loader(self):
        if not self.cfg.get("evaluate", True) or "val" not in self.cfg.data:
            return None
        dataset = build_dataset(self.cfg.data.val)
        batch_size = self.cfg.get("batch_size_val") or jax.process_count()
        sampler = ShardedSampler(
            len(dataset),
            shuffle=False,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
            drop_last=False,
        )
        return DataLoader(
            dataset,
            batch_size=max(batch_size // jax.process_count(), 1),
            sampler=sampler,
            collate_fn=self._collate_val,
            num_workers=self.cfg.get("num_worker", 8) // max(jax.process_count(), 1),
            drop_last=False,
        )

    def build_state(self) -> TrainState:
        batch = self._example_batch()
        batch = self.put_batch(batch)
        variables = jax.jit(self.model.init)(
            {"params": self.rng_key},
            batch["coord"],
            batch["feat"],
            batch["mask"],
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = jax.jit(self.tx.init)(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    # ---- sharding helpers ----
    def put_batch(self, batch: dict) -> dict:
        if batch.get("_device"):
            return {
                k: v for k, v in batch.items()
                if k not in ("extras", "_device", "_host")
            }
        return self._put_batch_impl(batch)

    def _put_batch_impl(self, batch: dict) -> dict:
        """Shard the (process-local) batch over the data mesh axis; drop
        host-only extras.

        Single-process: a plain device_put with the data sharding.
        Multi-process: every process holds only its shard of the global
        batch, assembled into one global array with
        ``jax.make_array_from_process_local_data`` (the reference's
        DistributedSampler + DDP input split, launch.py:74-87).

        The local batch must divide the local devices: short batches (the
        last validation batch, tiny smoke configs) are padded with fully
        masked empty scenes, whose points carry the ignore label and
        contribute nothing to losses or metrics.
        """
        n_local = jax.local_device_count()
        n_proc = jax.process_count()
        b = batch["mask"].shape[0]
        pad = (-b) % n_local
        sharding = NamedSharding(self.mesh, P("data"))
        ignore = self.cfg.data.get("ignore_index", -1)
        out = {}
        for k, v in batch.items():
            if k == "extras":
                continue
            if pad:
                fill = ignore if k in ("segment", "instance") else 0
                v = np.concatenate(
                    [v, np.full((pad,) + v.shape[1:], fill, v.dtype)], axis=0
                )
            if n_proc > 1:
                global_shape = (v.shape[0] * n_proc,) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, global_shape
                )
            else:
                out[k] = jax.device_put(v, sharding)
        return out

    def _local_rows(self, arr) -> np.ndarray:
        """This process's rows of a batch-sharded global array, in local
        batch order (inverse of put_batch's assembly)."""
        shards = sorted(
            arr.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    # ---- jitted steps ----
    def make_train_step(self):
        model, criteria, tx = self.model, self.criteria, self.tx
        has_segment_target = True

        @partial(
            jax.jit,
            donate_argnums=(0,),
        )
        def train_step(state: TrainState, batch: dict, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                target = batch.get("segment", batch.get("category"))
                logits, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["coord"],
                    batch["feat"],
                    batch["mask"],
                    False,  # deterministic
                    False,  # use_running_average
                    mutable=["batch_stats", "diagnostics"],
                    rngs={"dropout": rng},
                    **_category_kwargs(model, batch),
                )
                mask = batch["mask"] if logits.ndim == 3 else None
                loss = criteria(logits, target, mask)
                return loss, (mut["batch_stats"], mut.get("diagnostics", {}))

            (loss, (new_bs, diag)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            )
            metrics = {"loss": loss}
            diag_leaves = jax.tree_util.tree_leaves(diag)
            if diag_leaves:
                # e.g. GridPoolLayer's capacity-overflow counter; nonzero
                # means the static cluster caps are undersized for this batch
                metrics["pool_overflow"] = sum(
                    jnp.sum(x) for x in diag_leaves
                ).astype(jnp.float32)
            return new_state, metrics

        return train_step

    def make_eval_step(self):
        model, criteria = self.model, self.criteria
        K = self.cfg.data.num_classes
        ignore = self.cfg.data.get("ignore_index", -1)

        @jax.jit
        def eval_pred(state: TrainState, batch: dict):
            target = batch.get("segment", batch.get("category"))
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["coord"], batch["feat"], batch["mask"], True, True,
                **_category_kwargs(model, batch),
            )
            mask = batch["mask"] if logits.ndim == 3 else None
            loss = criteria(logits, target, mask)
            return loss, jnp.argmax(logits, axis=-1)

        self._eval_pred = eval_pred

        @jax.jit
        def eval_step(state: TrainState, batch: dict):
            target = batch.get("segment", batch.get("category"))
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["coord"],
                batch["feat"],
                batch["mask"],
                True,
                True,
                **_category_kwargs(model, batch),
            )
            mask = batch["mask"] if logits.ndim == 3 else None
            loss = criteria(logits, target, mask)
            pred = jnp.argmax(logits, axis=-1)
            if mask is not None:
                target = jnp.where(mask, target, ignore)
            inter, union, tgt = intersection_and_union_jax(
                pred, target, K, ignore
            )
            return loss, inter, union, tgt

        return eval_step

    # ---- loop ----
    def _device_prefetch(self, it, depth: int = 2):
        """Move ``put_batch`` (pad + device_put) off the step's critical
        path: a producer thread keeps ``depth`` batches already enqueued
        to the device while the current step runs, so the loop's data
        wait collapses to a queue get (the reference hides H2D behind
        ``.cuda(non_blocking)``, train.py:175-177)."""
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue(maxsize=depth)

        def produce():
            try:
                for batch in it:
                    extras = batch.get("extras")
                    host = {
                        k: batch[k]
                        for k in ("instance", "mask")
                        if k in batch
                    }
                    dev = self.put_batch(batch)
                    dev["_device"] = True
                    dev["_host"] = host
                    if extras is not None:
                        dev["extras"] = extras
                    q.put(dev)
                q.put(None)
            except BaseException as e:  # surface to the consumer
                q.put(e)

        t = _threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def run_epoch(self):
        self.train_loader.sampler.set_epoch(self.epoch)
        for i, batch in enumerate(
            self._device_prefetch(iter(self.train_loader))
        ):
            self.comm_info["iter"] = i
            self.before_step()
            self.run_step(batch)
            self.after_step()
            self.storage.step()

    def run_step(self, batch):
        batch = self.put_batch(batch)
        self.state, metrics = self._train_step(self.state, batch, self.rng_key)
        # pull the scalar to host: completes the step (axon's
        # block_until_ready does not synchronise) and feeds logging
        self.comm_info["loss_dict"] = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }

    def eval_batch(self, batch):
        """Loss + IoU histograms; when the batch carries origin_coord /
        origin_segment (reference evaluator.py:124-133), predictions on the
        grid-sampled points are re-projected to the full-resolution points
        by nearest neighbour before scoring.

        Multi-process note: the jitted path reduces over the GLOBAL batch
        inside jit (every process returns identical global histograms);
        the origin-coord path scores each process's local scenes on host
        and all-reduces the histograms (the reference's dist.all_reduce,
        evaluator.py:140-143)."""
        extras = batch.get("extras", {})
        if "origin_coord" not in extras:
            dev = self.put_batch(batch)
            return self._eval_step(self.state, dev)
        from ao_tpu.ops import knn
        from ao_tpu.utils import comm
        from ao_tpu.utils.misc import intersection_and_union

        dev = self.put_batch(batch)
        loss, pred = self._eval_pred(self.state, dev)
        pred = self._local_rows(pred)  # this process's scenes only
        K = self.cfg.data.num_classes
        ignore = self.cfg.data.get("ignore_index", -1)
        inter = np.zeros(K)
        union = np.zeros(K)
        target = np.zeros(K)
        for b in range(len(extras["origin_coord"])):
            oc = np.asarray(extras["origin_coord"][b], np.float32)
            os_ = np.asarray(extras["origin_segment"][b]).reshape(-1)
            m = np.asarray(batch["mask"][b])
            sampled = np.asarray(batch["coord"][b])[m]
            idx, _, _ = knn(
                jnp.asarray(oc[None]), jnp.asarray(sampled[None]), 1
            )
            full_pred = pred[b][m][np.asarray(idx[0, :, 0])]
            i, u, t = intersection_and_union(full_pred, os_, K, ignore)
            inter += i
            union += u
            target += t
        if jax.process_count() > 1:
            gathered = comm.all_gather((inter, union, target))
            inter = np.sum([g[0] for g in gathered], axis=0)
            union = np.sum([g[1] for g in gathered], axis=0)
            target = np.sum([g[2] for g in gathered], axis=0)
        return loss, inter, union, target

    def current_lr(self) -> float:
        return lr_at_step(
            dict(self.cfg.scheduler),
            base_lr=self.cfg.optimizer.lr,
            total_steps=self.total_steps,
            step=int(self.storage.iter) if self.storage else 0,
        )
