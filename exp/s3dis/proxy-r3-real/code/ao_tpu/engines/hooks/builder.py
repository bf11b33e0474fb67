"""HOOKS registry (reference: pointcept/engines/hooks/builder.py)."""

from ao_tpu.utils.registry import Registry

HOOKS = Registry("hooks")


def build_hooks(cfg_list):
    return [HOOKS.build(dict(cfg)) for cfg in (cfg_list or [])]
