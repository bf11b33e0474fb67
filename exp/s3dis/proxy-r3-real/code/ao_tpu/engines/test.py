"""Whole-scene testers (reference: pointcept/engines/test.py).

``SemSegTester`` (:32-234) runs the fragment-voting protocol: each scene is
expanded by the dataset into TTA-augmented complementary voxel fragments;
each fragment runs through the jitted forward (padded to a bucketed size so
a handful of compiled shapes serve every fragment), softmax logits are
scatter-added into a full-resolution accumulator on host, and the argmax is
scored against full-resolution GT. Per-scene predictions are cached as .npy
for resume (:85-92). ``ClsTester`` (:237-313) votes over augmented views.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.datasets import build_dataset
from ao_tpu.datasets.collate import collate_fn
from ao_tpu.models import build_criteria, build_model
from ao_tpu.utils import get_root_logger
from ao_tpu.utils.checkpoint import load_checkpoint
from ao_tpu.utils.events import AverageMeter
from ao_tpu.utils.misc import intersection_and_union
from ao_tpu.utils.registry import Registry

TEST = Registry("test")


class TesterBase:
    """Holds model/state; either attached by PreciseEvaluator (trainer) or
    built standalone from config + checkpoint (tools/test.py)."""

    trainer = None

    def __init__(self, cfg=None, verbose=True):
        self.cfg = cfg
        self.verbose = verbose
        self._fwd_cache = {}

    # -- model/state access --
    def setup(self, cfg):
        self.cfg = cfg
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "test.log")
        )
        if self.trainer is not None:
            self.model = self.trainer.model
            self.state = self.trainer.state
        else:
            self.model = build_model(dict(cfg.model))
            weight = cfg.get("weight") or os.path.join(
                cfg.save_path, "model", "model_best.ckpt"
            )
            self.logger.info(f"Loading weights: {weight}")
            raw, meta = load_checkpoint(weight)
            state_dict = raw.get("state", raw) if isinstance(raw, dict) else raw

            class _S:
                pass

            self.state = _S()
            self.state.params = state_dict["params"]
            self.state.batch_stats = state_dict.get("batch_stats", {})
            self._restore_concrete()
        self.save_path = cfg.save_path

    def _restore_concrete(self):
        self.state.params = jax.tree_util.tree_map(
            jnp.asarray, self.state.params
        )
        self.state.batch_stats = jax.tree_util.tree_map(
            jnp.asarray, self.state.batch_stats
        )

    def forward(self, coord, feat, mask, category=None):
        """Jitted eval forward, cached per padded shape bucket."""
        key = (coord.shape, feat.shape, category is not None)
        if key not in self._fwd_cache:
            model = self.model

            @jax.jit
            def fwd(params, batch_stats, coord, feat, mask, category=None):
                kwargs = {} if category is None else {"category": category}
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    coord, feat, mask, True, True, **kwargs,
                )

            self._fwd_cache[key] = fwd
        args = (self.state.params, self.state.batch_stats, coord, feat, mask)
        if category is not None:
            return self._fwd_cache[key](*args, category=category)
        return self._fwd_cache[key](*args)

    def vote_fragments(self, frags, n, num_classes, pad_multiple, fb=8):
        """Softmax-vote TTA fragments into a full-scene (n, K) accumulator.

        Fragments are batched ``fb`` at a time into one fixed-shape
        forward — a scene's complementary voxel fragments are
        near-identical in size, so they share a pad bucket and the
        per-fragment dispatch / host-sync cost amortises (the reference
        streams fragments through a batched loader, test.py:94-123).
        """
        pred = np.zeros((n, num_classes), np.float32)
        for i0 in range(0, len(frags), fb):
            group = frags[i0 : i0 + fb]
            indices = [f["index"] for f in group]
            batch = collate_fn(
                [{k: v for k, v in f.items() if k != "index"} for f in group],
                pad_multiple=pad_multiple,
            )
            logits = self.forward(
                jnp.asarray(batch["coord"]),
                jnp.asarray(batch["feat"]),
                jnp.asarray(batch["mask"]),
            )
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))
            for b, index in enumerate(indices):
                # valid rows are the first len(index) of each batch row
                # (collate pads at the tail)
                pred[index] += probs[b, : len(index)]
        return pred


@TEST.register_module()
class SemSegTester(TesterBase):
    def __call__(self):
        cfg = self.cfg if self.trainer is None else self.trainer.cfg
        self.setup(cfg)
        logger = self.logger
        dataset = build_dataset(dict(cfg.data.test))
        K = cfg.data.num_classes
        ignore = cfg.data.get("ignore_index", -1)
        pad_multiple = cfg.get("pad_multiple", 4096)

        save_path = os.path.join(cfg.save_path, "result")
        os.makedirs(save_path, exist_ok=True)
        intersection_meter = AverageMeter()
        union_meter = AverageMeter()
        target_meter = AverageMeter()
        record = {}

        scene_ids = list(range(len(dataset)))
        # shard scenes across processes
        scene_ids = scene_ids[jax.process_index() :: jax.process_count()]
        for pos, idx in enumerate(scene_ids):
            data_dict = dataset[idx]
            name = data_dict["name"]
            segment = data_dict["segment"]
            pred_save = os.path.join(save_path, f"{name}_pred.npy")
            if os.path.isfile(pred_save):
                pred = np.load(pred_save)
            else:
                pred = self.vote_fragments(
                    data_dict["fragment_list"], segment.shape[0], K,
                    pad_multiple, int(cfg.get("test_fragments_per_batch", 8)),
                )
                np.save(pred_save, pred)
            seg_pred = pred.argmax(-1)
            inter, union, target = intersection_and_union(
                seg_pred, segment, K, ignore
            )
            intersection_meter.update(inter)
            union_meter.update(union)
            target_meter.update(target)
            record[name] = dict(intersection=inter, union=union, target=target)
            self.save_submission(cfg, save_path, name, seg_pred, dataset)
            mask_v = union != 0
            iou = inter[mask_v] / (union[mask_v] + 1e-10)
            acc = (
                inter.sum() / (target.sum() + 1e-10) if target.sum() > 0 else 1.0
            )
            m_iou = np.mean(
                intersection_meter.sum / (union_meter.sum + 1e-10)
            )
            logger.info(
                f"Test: {name} [{pos + 1}/{len(scene_ids)}] "
                f"Acc {acc:.4f} mIoU {np.mean(iou) if len(iou) else 0:.4f} "
                f"running mIoU {m_iou:.4f}"
            )

        # final metrics: merge every process's per-scene records (the
        # reference pickles meters over gloo, test.py:197-229)
        if jax.process_count() > 1:
            from ao_tpu.utils import comm

            for rec in comm.all_gather(record):
                for name, r in rec.items():
                    if name not in record:
                        record[name] = r
            inter = np.sum([r["intersection"] for r in record.values()], axis=0)
            union = np.sum([r["union"] for r in record.values()], axis=0)
            target = np.sum([r["target"] for r in record.values()], axis=0)
        else:
            inter = intersection_meter.sum
            union = union_meter.sum
            target = target_meter.sum
        iou_class = inter / (union + 1e-10)
        acc_class = inter / (target + 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter.sum() / (target.sum() + 1e-10))
        logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        names = cfg.data.get("names", [str(i) for i in range(K)])
        for i in range(K):
            logger.info(
                f"Class_{i}-{names[i]} Result: iou/accuracy "
                f"{iou_class[i]:.4f}/{acc_class[i]:.4f}"
            )
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(mIoU=m_iou, mAcc=m_acc, allAcc=all_acc)

    @staticmethod
    def save_submission(cfg, save_path, name, pred, dataset):
        """Benchmark submission writers (reference: engines/test.py:157-195):
        ScanNet txt of raw ids, SemanticKITTI uint32 .label via the inverse
        learning map, NuScenes uint8 lidarseg bins."""
        if not cfg.get("submit", False):
            return
        dtype = cfg.get("dataset_type", "")
        if dtype in ("ScanNetDataset", "ScanNet200Dataset"):
            from ao_tpu.datasets.preprocessing.scannet_meta import (
                VALID_CLASS_IDS_20, VALID_CLASS_IDS_200,
            )

            ids = (
                VALID_CLASS_IDS_200 if dtype == "ScanNet200Dataset"
                else VALID_CLASS_IDS_20
            )
            sub_dir = os.path.join(save_path, "submit")
            os.makedirs(sub_dir, exist_ok=True)
            np.savetxt(
                os.path.join(sub_dir, f"{name}.txt"),
                np.asarray(ids)[pred].reshape(-1, 1),
                fmt="%d",
            )
        elif dtype == "SemanticKITTIDataset":
            seq, frame = name.split("_")
            sub_dir = os.path.join(
                save_path, "submit", "sequences", seq, "predictions"
            )
            os.makedirs(sub_dir, exist_ok=True)
            inv = cfg.get("learning_map_inv")
            out = pred.astype(np.uint32)
            if inv:
                lut = np.zeros(max(inv.keys()) + 1, np.uint32)
                for k, v in inv.items():
                    lut[k] = v
                out = lut[np.clip(out, 0, len(lut) - 1)]
            out.tofile(os.path.join(sub_dir, f"{frame}.label"))
        elif dtype == "NuScenesDataset":
            sub_dir = os.path.join(save_path, "submit", "lidarseg", "test")
            os.makedirs(sub_dir, exist_ok=True)
            (pred + 1).astype(np.uint8).tofile(
                os.path.join(sub_dir, f"{name}_lidarseg.bin")
            )


@TEST.register_module()
class ClsTester(TesterBase):
    def __call__(self):
        cfg = self.cfg if self.trainer is None else self.trainer.cfg
        self.setup(cfg)
        logger = self.logger
        dataset = build_dataset(dict(cfg.data.test))
        K = cfg.data.num_classes
        correct, total = 0, 0
        inter_sum = np.zeros(K)
        target_sum = np.zeros(K)
        pad_multiple = cfg.get("pad_multiple", 1024)
        for idx in range(len(dataset)):
            sample = dataset[idx]
            category = int(np.asarray(sample["category"]).reshape(-1)[0])
            batch = collate_fn([sample], pad_multiple=pad_multiple)
            logits = self.forward(
                jnp.asarray(batch["coord"]),
                jnp.asarray(batch["feat"]),
                jnp.asarray(batch["mask"]),
            )
            pred = int(np.asarray(jnp.argmax(logits[0])))
            correct += int(pred == category)
            total += 1
            if pred == category:
                inter_sum[category] += 1
            target_sum[category] += 1
            if self.verbose and idx % 50 == 0:
                logger.info(f"Test: [{idx + 1}/{len(dataset)}] acc {correct/total:.4f}")
        all_acc = correct / max(total, 1)
        m_acc = float(np.mean(inter_sum / np.maximum(target_sum, 1)))
        logger.info(f"Test result: mAcc {m_acc:.4f} allAcc {all_acc:.4f}")
        return dict(allAcc=all_acc, mAcc=m_acc)


@TEST.register_module()
class PartSegTester(TesterBase):
    """Part segmentation tester (reference: engines/test.py:316-410):
    softmax voting over augmented views, category-constrained part IoU
    averaged per shape category."""

    def __call__(self):
        cfg = self.cfg if self.trainer is None else self.trainer.cfg
        self.setup(cfg)
        logger = self.logger
        dataset = build_dataset(dict(cfg.data.test))
        K = cfg.data.num_classes
        pad_multiple = cfg.get("pad_multiple", 1024)
        categories = dataset.categories
        category2part = dataset.category2part
        iou_category = np.zeros(len(categories))
        iou_count = np.zeros(len(categories))

        for idx in range(len(dataset)):
            sample = dataset[idx]
            label = np.asarray(sample["segment"]).reshape(-1)
            cat_idx = int(np.asarray(sample["category"]).reshape(-1)[0])
            category = jnp.asarray(np.asarray([cat_idx], np.int32))
            # vote softmax logits over the TTA views (reference
            # test.py:316-410 sums predictions over `aug_transform` views);
            # each view's `index` maps its points back to the shape
            views = sample.get("fragment_list") or [sample]
            probs = np.zeros((label.size, K), np.float64)
            counts = np.zeros((label.size, 1), np.float64)
            for view in views:
                batch = collate_fn([view], pad_multiple=pad_multiple)
                logits = self.forward(
                    jnp.asarray(batch["coord"]),
                    jnp.asarray(batch["feat"]),
                    jnp.asarray(batch["mask"]),
                    category=category,
                )
                m = np.asarray(batch["mask"][0])
                p = np.asarray(jax.nn.softmax(logits[0], axis=-1))[m]
                vidx = np.asarray(
                    view.get("index", np.arange(label.size))
                ).reshape(-1)
                np.add.at(probs, vidx, p[: vidx.size])
                np.add.at(counts, vidx, 1.0)
            probs /= np.maximum(counts, 1.0)
            pred = probs.argmax(-1)

            category = categories[cat_idx]
            parts = category2part[category]
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                gt_m = label == part
                pr_m = pred == part
                if not gt_m.any() and not pr_m.any():
                    parts_iou[j] = 1.0
                else:
                    inter = np.sum(gt_m & pr_m)
                    union = np.sum(gt_m | pr_m)
                    parts_iou[j] = inter / max(union, 1)
            iou_category[cat_idx] += parts_iou.mean()
            iou_count[cat_idx] += 1
            if self.verbose and idx % 50 == 0:
                logger.info(f"Test: [{idx + 1}/{len(dataset)}]")

        # Reference averages over ALL categories, counting ones absent
        # from the split as 0 (test.py:392-393)
        ins_miou = iou_category.sum() / (iou_count.sum() + 1e-10)
        cat_miou = np.mean(iou_category / (iou_count + 1e-10))
        logger.info(
            f"Test result: ins.mIoU/cat.mIoU {ins_miou:.4f}/{cat_miou:.4f}"
        )
        return dict(ins_mIoU=float(ins_miou), cat_mIoU=float(cat_miou))
