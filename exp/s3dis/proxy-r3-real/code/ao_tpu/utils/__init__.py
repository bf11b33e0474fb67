from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict, DictAction
from .logger import get_root_logger
from .events import (
    EventStorage,
    get_event_storage,
    HistoryBuffer,
    AverageMeter,
    JSONWriter,
    TensorboardWriter,
)
from .env import set_seed, get_random_seed
from .misc import intersection_and_union, intersection_and_union_jax
