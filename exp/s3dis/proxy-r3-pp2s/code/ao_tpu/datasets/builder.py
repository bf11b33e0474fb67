"""Dataset registry (reference: pointcept/datasets/builder.py)."""

from ao_tpu.utils.registry import Registry

DATASETS = Registry("datasets")


def build_dataset(cfg):
    return DATASETS.build(dict(cfg))
