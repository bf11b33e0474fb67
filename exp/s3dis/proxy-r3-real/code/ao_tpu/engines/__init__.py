from .launch import launch
from .defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from .train import Trainer, TrainerBase, TrainState
from .test import TEST
from . import hooks  # noqa: F401
