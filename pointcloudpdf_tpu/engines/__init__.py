from .defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from .launch import launch
from .train import TRAINERS, OpenSegTrainer, Trainer, TrainerBase, TrainState
from .test import TESTERS, TesterBase, SemSegTester, OpenSegTester, ClsTester
from . import hooks
