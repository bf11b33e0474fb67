"""Optimizer construction (reference: pointcept/utils/optimizer.py:20-55).

Builds an ``optax.GradientTransformation`` from a config dict, with the
reference's ``param_dicts`` keyword-matched parameter groups: each group may
override ``lr`` (as a multiplier on the shared schedule), ``momentum`` and
``weight_decay``. Groups are routed with ``optax.multi_transform`` over
labels derived from flattened parameter path names.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import optax

from .registry import Registry

OPTIMIZERS = Registry("optimizers")


def _wd_mask(params):
    """Decay weights only for arrays with >1 dims (skip biases/norm scales),
    matching common torch practice where norm/bias decay is harmless but the
    reference applies decay to all params; we keep all-params decay for
    parity and expose this mask for opt-in use."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


@OPTIMIZERS.register_module()
def SGD(lr_schedule, momentum=0.9, weight_decay=0.0, nesterov=False, **_):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(lr_schedule, momentum=momentum, nesterov=nesterov),
    )


@OPTIMIZERS.register_module()
def Adam(lr_schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps),
    )


@OPTIMIZERS.register_module()
def AdamW(lr_schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01, **_):
    return optax.adamw(
        lr_schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


def _param_path_names(params) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            for path, _ in flat]


def build_optimizer(
    cfg: dict,
    params,
    scheduler_cfg: Optional[dict] = None,
    total_steps: int = 1,
) -> optax.GradientTransformation:
    """Build the full gradient transformation (scheduler included).

    ``cfg``: {"type": "AdamW", "lr": ..., "weight_decay": ...}.
    ``param_dicts``: [{"keyword": str, "lr"/"momentum"/"weight_decay": ...}]
    — a param whose flattened path contains ``keyword`` joins that group
    (first match wins), mirroring reference keyword matching on
    ``named_parameters()``.
    """
    from .scheduler import build_scheduler

    cfg = dict(cfg)
    opt_type = cfg.pop("type")
    base_lr = cfg.pop("lr")
    param_dicts = cfg.pop("param_dicts", None)
    scheduler_cfg = dict(scheduler_cfg or {"type": "MultiStepLR", "milestones": []})

    def make_group(group_overrides: dict) -> optax.GradientTransformation:
        g = dict(cfg)
        g.update({k: v for k, v in group_overrides.items() if k != "keyword"})
        g_lr = g.pop("lr", base_lr)
        sched = build_scheduler(scheduler_cfg, base_lr=g_lr, total_steps=total_steps)
        return OPTIMIZERS.build({"type": opt_type, "lr_schedule": sched, **g})

    if not param_dicts:
        return make_group({})

    transforms = {"default": make_group({})}
    for i, pd in enumerate(param_dicts):
        transforms[f"group{i}"] = make_group(dict(pd))

    keywords = [pd["keyword"] for pd in param_dicts]

    def label_fn(params):
        def label_one(path, _):
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            for i, kw in enumerate(keywords):
                if kw in name:
                    return f"group{i}"
            return "default"

        return jax.tree_util.tree_map_with_path(label_one, params)

    return optax.multi_transform(transforms, label_fn)


def lr_at_step(scheduler_cfg: Optional[dict], base_lr: float, total_steps: int,
               step: int) -> float:
    """Host-side peek at the scheduled lr (for logging)."""
    from .scheduler import build_scheduler

    sched = build_scheduler(
        dict(scheduler_cfg or {"type": "MultiStepLR", "milestones": []}),
        base_lr=base_lr,
        total_steps=total_steps,
    )
    return float(sched(step))
