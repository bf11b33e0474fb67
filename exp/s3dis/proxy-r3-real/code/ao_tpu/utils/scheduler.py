"""Per-step learning-rate schedules (reference: pointcept/utils/scheduler.py:15-147).

The reference wraps torch ``lr_scheduler`` classes and steps them per
iteration; here each registered scheduler is a factory returning an optax
schedule ``step -> lr``. ``total_steps`` is injected by the trainer, exactly
like the reference (``train.py:281``). Milestones are given as fractions of
``total_steps``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax

from .registry import Registry

SCHEDULERS = Registry("schedulers")


@SCHEDULERS.register_module()
def MultiStepLR(base_lr, total_steps, milestones, gamma=0.1):
    boundaries = {int(r * total_steps): gamma for r in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


@SCHEDULERS.register_module()
def MultiStepWithWarmupLR(
    base_lr, total_steps, milestones, gamma=0.1, warmup_rate=0.05, warmup_scale=1e-6
):
    steps = [int(r * total_steps) for r in milestones]
    warmup_steps = warmup_rate * total_steps

    def schedule(s):
        s = jnp.asarray(s, jnp.float32)
        factor = jnp.ones_like(s)
        for m in steps:
            factor = factor * jnp.where(s >= m, gamma, 1.0)
        warm = 1.0 - (1.0 - s / warmup_steps) * (1.0 - warmup_scale)
        coeff = jnp.where(s <= warmup_steps, warm, 1.0)
        return base_lr * coeff * factor

    return schedule


@SCHEDULERS.register_module()
def PolyLR(base_lr, total_steps, power=0.9):
    def schedule(s):
        return base_lr * (1.0 - jnp.asarray(s, jnp.float32) / (total_steps + 1)) ** power

    return schedule


@SCHEDULERS.register_module()
def ExpLR(base_lr, total_steps, gamma=0.9):
    def schedule(s):
        return base_lr * gamma ** (jnp.asarray(s, jnp.float32) / total_steps)

    return schedule


@SCHEDULERS.register_module()
def CosineAnnealingLR(base_lr, total_steps, eta_min=0.0):
    def schedule(s):
        cos = jnp.cos(jnp.pi * jnp.asarray(s, jnp.float32) / total_steps)
        return eta_min + (base_lr - eta_min) * (1 + cos) / 2

    return schedule


@SCHEDULERS.register_module()
def OneCycleLR(
    base_lr,
    total_steps,
    max_lr=None,
    pct_start=0.3,
    anneal_strategy="cos",
    div_factor=25.0,
    final_div_factor=1e4,
    **_unused,
):
    """Cosine one-cycle (momentum cycling is not replicated; AdamW configs in
    the reference do not use it)."""
    if max_lr is None:
        max_lr = base_lr
    if isinstance(max_lr, (list, tuple)):
        max_lr = max_lr[0]
    assert anneal_strategy == "cos", "only cosine anneal is implemented"
    if total_steps <= 1:  # degenerate smoke runs: constant lr
        return lambda s: jnp.full(jnp.shape(s), max_lr, jnp.float32)
    # optax floors the warmup boundary to int; a zero-length warmup interval
    # (tiny total_steps) divides by zero -> nan lr. Clamp to [1, steps-1].
    warmup = min(max(int(pct_start * total_steps), 1), total_steps - 1)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        # +0.5 so optax's int() floor lands exactly on `warmup` despite fp
        pct_start=(warmup + 0.5) / total_steps,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def build_scheduler(cfg: dict, base_lr: float, total_steps: int):
    cfg = dict(cfg)
    cfg.setdefault("base_lr", base_lr)
    cfg.setdefault("total_steps", total_steps)
    return SCHEDULERS.build(cfg)
