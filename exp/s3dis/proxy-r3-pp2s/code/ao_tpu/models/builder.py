"""Model registries (reference: pointcept/models/builder.py)."""

from ao_tpu.utils.registry import Registry

MODELS = Registry("models")
MODULES = Registry("modules")


def build_model(cfg):
    return MODELS.build(cfg)
