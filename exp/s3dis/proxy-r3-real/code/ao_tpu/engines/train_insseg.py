"""Instance segmentation training (PointGroup).

The PointGroup model returns (seg_logits, bias_pred) and its loss needs
instance centers, so the train/eval steps differ from the semantic
trainer; everything else (mesh sharding, hooks, checkpoints) is inherited.
The ``InsSegEvaluator`` hook runs proposal generation on host (native BFS
clustering) and scores ScanNet-protocol AP (engines/insseg_eval.py),
mirroring the reference InsSegEvaluator
(reference: pointcept/engines/hooks/evaluator.py:204-581).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.models.point_group import point_group_loss, propose_instances

from .hooks import HOOKS, HookBase
from .insseg_eval import ap_scores, associate_instances, evaluate_matches
from .train import Trainer


class InsSegTrainer(Trainer):
    def make_train_step(self):
        model, tx = self.model, self.tx
        ignore = self.cfg.data.get("ignore_index", -1)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                (seg_logits, bias_pred), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["coord"], batch["feat"], batch["mask"],
                    False, False,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                losses = point_group_loss(
                    seg_logits, bias_pred, batch["coord"], batch["segment"],
                    batch["instance"], batch["instance_center"],
                    batch["mask"], ignore_index=ignore,
                )
                return losses["loss"], (mut["batch_stats"], losses)

            (loss, (new_bs, losses)), grads = jax.value_and_grad(
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
            return new_state, losses

        return train_step

    def make_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(state, batch):
            seg_logits, bias_pred = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["coord"], batch["feat"], batch["mask"], True, True,
            )
            return seg_logits, bias_pred

        return eval_step

    def eval_scene(self, batch):
        batch_dev = self.put_batch(batch)
        seg_logits, bias_pred = self._eval_step(self.state, batch_dev)
        return np.asarray(seg_logits), np.asarray(bias_pred)


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    def __init__(self, segment_ignore_index=(-1,), instance_ignore_index=-1,
                 min_region_size: int = 100):
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.min_region_size = min_region_size

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and (
            self.trainer.val_loader is not None
        ):
            self.eval()

    def eval(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start InsSeg Evaluation >>>>>>>>>>>>>>>>")
        cfg = trainer.cfg
        names = cfg.data.names
        K = cfg.data.num_classes
        pg = trainer.model
        scenes = []
        for batch in trainer.val_loader:
            seg_logits, bias_pred = trainer.eval_scene(batch)
            mask = np.asarray(batch["mask"])
            for b in range(mask.shape[0]):
                m = mask[b]
                if not m.any():
                    continue
                pred = propose_instances(
                    seg_logits[b][m], bias_pred[b][m],
                    np.asarray(batch["coord"][b])[m],
                    segment_ignore_index=self.segment_ignore_index,
                    cluster_thresh=pg.cluster_thresh,
                    cluster_min_points=pg.cluster_min_points,
                    cluster_propose_points=pg.cluster_propose_points,
                    voxel_size=pg.voxel_size,
                )
                gt, pr = associate_instances(
                    pred,
                    np.asarray(batch["segment"][b])[m],
                    np.asarray(batch["instance"][b])[m],
                    K, names,
                    segment_ignore_index=self.segment_ignore_index,
                    instance_ignore_index=self.instance_ignore_index,
                    min_region_size=self.min_region_size,
                )
                scenes.append(dict(gt=gt, pred=pr))
        valid_names = [
            names[i] for i in range(K) if i not in self.segment_ignore_index
        ]
        table = evaluate_matches(
            scenes, valid_names, min_region_size=self.min_region_size
        )
        scores = ap_scores(table, valid_names)
        trainer.logger.info(
            f"Val insseg: mAP/AP50/AP25 {scores['all_ap']:.4f}/"
            f"{scores['all_ap_50']:.4f}/{scores['all_ap_25']:.4f}"
        )
        if trainer.writer is not None:
            ep = trainer.epoch + 1
            trainer.writer.add_scalar("val/mAP", scores["all_ap"], ep)
            trainer.writer.add_scalar("val/AP50", scores["all_ap_50"], ep)
            trainer.writer.add_scalar("val/AP25", scores["all_ap_25"], ep)
        trainer.comm_info["current_metric_value"] = scores["all_ap_50"]
        trainer.comm_info["current_metric_name"] = "AP50"
