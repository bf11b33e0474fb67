"""Standard hooks (reference: pointcept/engines/hooks/misc.py).

IterationTimer :33-76, InformationWriter :79-144, CheckpointSaver :147-208,
CheckpointLoader :211-252, PreciseEvaluator :255-296, RuntimeProfiler
:333-482 (jax.profiler traces instead of torch.profiler).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from ao_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from ao_tpu.utils.events import AverageMeter
from ao_tpu.utils.optimizer import lr_at_step

from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class IterationTimer(HookBase):
    def __init__(self, warmup_iter=2):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._iter_timer = time.perf_counter()
        self._remain_iter = 0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._remain_iter = self.trainer.max_epoch * len(self.trainer.train_loader)

    def before_epoch(self):
        self._iter_timer = time.perf_counter()

    def before_step(self):
        data_time = time.perf_counter() - self._iter_timer
        self.trainer.storage.put_scalar("data_time", data_time)

    def after_step(self):
        batch_time = time.perf_counter() - self._iter_timer
        self._iter_timer = time.perf_counter()
        self.trainer.storage.put_scalar("batch_time", batch_time)
        self._remain_iter -= 1
        remain_time = self._remain_iter * self.trainer.storage.history(
            "batch_time"
        ).avg(50)
        t_m, t_s = divmod(remain_time, 60)
        t_h, t_m = divmod(t_m, 60)
        self.trainer.comm_info["iter_info"] += (
            f"Data {self.trainer.storage.history('data_time').latest():.3f} "
            f"({self.trainer.storage.history('data_time').avg(50):.3f}) "
            f"Batch {batch_time:.3f} "
            f"({self.trainer.storage.history('batch_time').avg(50):.3f}) "
            f"Remain {int(t_h):02d}:{int(t_m):02d}:{int(t_s):02d} "
        )


@HOOKS.register_module()
class InformationWriter(HookBase):
    def __init__(self):
        self.curr_iter = 0

    def before_train(self):
        self.trainer.comm_info["iter_info"] = ""
        self.curr_iter = self.trainer.start_epoch * len(self.trainer.train_loader)

    def before_step(self):
        self.curr_iter += 1
        info = (
            f"Train: [{self.trainer.epoch + 1}/{self.trainer.max_epoch}]"
            f"[{self.trainer.comm_info['iter']+1}/{len(self.trainer.train_loader)}] "
        )
        self.trainer.comm_info["iter_info"] += info

    def after_step(self):
        if "loss_dict" in self.trainer.comm_info:
            for key, value in self.trainer.comm_info["loss_dict"].items():
                self.trainer.storage.put_scalar(key, float(value))
                self.trainer.comm_info["iter_info"] += f"{key}: {float(value):.4f} "
        lr = self.trainer.current_lr()
        self.trainer.comm_info["iter_info"] += f"Lr: {lr:.5f}"
        self.trainer.logger.info(self.trainer.comm_info["iter_info"])
        self.trainer.comm_info["iter_info"] = ""
        if self.trainer.writer is not None:
            self.trainer.writer.add_scalar("lr", lr, self.curr_iter)
            for key, value in self.trainer.comm_info.get("loss_dict", {}).items():
                self.trainer.writer.add_scalar(
                    "train_batch/" + key, float(value), self.curr_iter
                )

    def after_epoch(self):
        epoch_info = "Train result: "
        for key in self.trainer.comm_info.get("loss_dict", {}).keys():
            avg = self.trainer.storage.history(key).avg(
                len(self.trainer.train_loader)
            )
            epoch_info += f"{key}: {avg:.4f} "
            if self.trainer.writer is not None:
                self.trainer.writer.add_scalar(
                    "train/" + key, avg, self.trainer.epoch + 1
                )
        self.trainer.logger.info(epoch_info)


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Atomic model_last + model_best + periodic epoch checkpoints
    (reference: hooks/misc.py:147-208)."""

    def __init__(self, save_freq=None):
        self.save_freq = save_freq

    def after_epoch(self):
        trainer = self.trainer
        if not trainer.is_main_process:
            return
        is_best = False
        current_metric_value = trainer.comm_info.get("current_metric_value", 0.0)
        current_metric_name = trainer.comm_info.get("current_metric_name", "metric")
        if current_metric_value > trainer.best_metric_value:
            trainer.best_metric_value = current_metric_value
            is_best = True
            trainer.logger.info(
                f"Best validation {current_metric_name} updated to "
                f"{current_metric_value:.4f}"
            )
        trainer.logger.info(
            f"Currently Best {current_metric_name}: "
            f"{trainer.best_metric_value:.4f}"
        )
        path = os.path.join(trainer.save_path, "model", "model_last.ckpt")
        save_checkpoint(
            path,
            trainer.state,
            meta=dict(
                epoch=trainer.epoch + 1,
                best_metric_value=float(trainer.best_metric_value),
            ),
        )
        if is_best:
            shutil.copyfile(
                path, os.path.join(trainer.save_path, "model", "model_best.ckpt")
            )
        if self.save_freq and (trainer.epoch + 1) % self.save_freq == 0:
            shutil.copyfile(
                path,
                os.path.join(
                    trainer.save_path, "model", f"epoch_{trainer.epoch + 1}.ckpt"
                ),
            )


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Resume/fine-tune from ``cfg.weight`` (reference: hooks/misc.py:211-252)."""

    def __init__(self, keywords="", replacement=None, strict=False):
        self.keywords = keywords
        self.replacement = replacement if replacement is not None else keywords
        self.strict = strict

    def before_train(self):
        trainer = self.trainer
        weight = trainer.cfg.get("weight")
        if not weight:
            return
        if not os.path.isfile(weight):
            raise FileNotFoundError(f"checkpoint not found: {weight}")
        trainer.logger.info(f"Loading checkpoint {weight}")
        if trainer.cfg.get("resume"):
            state, meta = load_checkpoint(weight, target_state=trainer.state)
            trainer.state = state
            trainer.start_epoch = int(meta.get("epoch", 0))
            trainer.best_metric_value = float(meta.get("best_metric_value", -1e9))
            trainer.logger.info(
                f"Resuming from epoch {trainer.start_epoch} "
                f"(best {trainer.best_metric_value:.4f})"
            )
        else:
            # weights only (fine-tune): restore params/batch_stats, keep
            # fresh optimizer/schedule
            raw, meta = load_checkpoint(weight)
            state_dict = raw.get("state", raw) if isinstance(raw, dict) else raw
            from flax import serialization

            target = {
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            }
            restored = serialization.from_state_dict(
                target,
                {
                    "params": state_dict["params"],
                    "batch_stats": state_dict["batch_stats"],
                },
            )
            trainer.state = trainer.state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"]
            )
            trainer.logger.info("Loaded model weights (no optimizer state)")


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Run the full TTA tester after training (reference: hooks/misc.py:255-296)."""

    def __init__(self, test_last=False):
        self.test_last = test_last

    def after_train(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Precise Evaluation >>>>>>>>>>>>>>>>")
        from ao_tpu.engines.test import TEST

        if not self.test_last:
            best = os.path.join(trainer.save_path, "model", "model_best.ckpt")
            if os.path.isfile(best):
                state, _ = load_checkpoint(best, target_state=trainer.state)
                trainer.state = state
        tester = TEST.build(dict(trainer.cfg.test))
        tester.trainer = trainer
        tester()


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """jax.profiler trace over the first training steps
    (reference torch.profiler hooks: misc.py:333-482)."""

    def __init__(self, warm_up=2, profile_steps=3):
        self.warm_up = warm_up
        self.profile_steps = profile_steps
        self._active = False

    def before_step(self):
        import jax

        it = self.trainer.comm_info["iter"]
        if it == self.warm_up and not self._active:
            trace_dir = os.path.join(self.trainer.save_path, "profile")
            self.trainer.logger.info(f"Profiling to {trace_dir}")
            jax.profiler.start_trace(trace_dir)
            self._active = True

    def after_step(self):
        import jax

        it = self.trainer.comm_info["iter"]
        if self._active and it >= self.warm_up + self.profile_steps:
            jax.profiler.stop_trace()
            self._active = False
            self.trainer.logger.info("Profiling done.")


@HOOKS.register_module()
class DataCacheOperator(HookBase):
    """Pre-populate the shared-memory dataset cache before training
    (reference: hooks/misc.py:299-330 with SharedArray; here the mmap-npz
    cache in ao_tpu.utils.cache)."""

    def __init__(self, data_root=None, mem_size_limit_gb=None):
        self.data_root = data_root
        self.mem_size_limit_gb = mem_size_limit_gb

    def before_train(self):
        from ao_tpu.datasets.defaults import load_scene
        from ao_tpu.utils.cache import shared_dict

        trainer = self.trainer
        dataset = trainer.train_loader.dataset
        data_list = getattr(dataset, "data_list", [])
        if not data_list or not isinstance(data_list[0], str):
            return
        trainer.logger.info(f"=> Caching {len(data_list)} scenes to shm ...")
        total = 0
        for path in data_list:
            try:
                data = load_scene(path)
            except Exception:
                continue
            total += sum(
                getattr(v, "nbytes", 0) for v in data.values()
            )
            if (
                self.mem_size_limit_gb
                and total > self.mem_size_limit_gb * 1024**3
            ):
                trainer.logger.warning("shm cache size limit reached")
                break
            shared_dict("ao-" + path, data)
        trainer.logger.info("=> Done.")


@HOOKS.register_module()
class RuntimeProfilerV2(HookBase):
    """Scheduled jax.profiler trace with wait/warmup/active semantics
    (reference torch.profiler schedule hook: hooks/misc.py:412-482)."""

    def __init__(self, wait=1, warmup=1, active=2, repeat=1, interrupt=False):
        self.wait = wait
        self.warmup = warmup
        self.active = active
        self.repeat = repeat
        self.interrupt = interrupt
        self._cycle = wait + warmup + active
        self._tracing = False
        self._done = 0

    def before_step(self):
        import jax

        if self._done >= self.repeat:
            return
        it = self.trainer.comm_info["iter"]
        pos = it % self._cycle
        if pos == self.wait + self.warmup and not self._tracing:
            trace_dir = os.path.join(self.trainer.save_path, "profile_v2")
            jax.profiler.start_trace(trace_dir)
            self._tracing = True

    def after_step(self):
        import jax

        if not self._tracing:
            return
        it = self.trainer.comm_info["iter"]
        pos = it % self._cycle
        if pos == self._cycle - 1:
            jax.profiler.stop_trace()
            self._tracing = False
            self._done += 1
            self.trainer.logger.info(
                f"RuntimeProfilerV2: trace {self._done}/{self.repeat} done"
            )
            if self.interrupt and self._done >= self.repeat:
                self.trainer.logger.info("Profiler interrupt: exiting.")
                sys.exit(0)
