"""Training runtime: typed configs, optimizer/schedule factory, jitted train steps,
trainer loop, loss meters, Orbax checkpointing.

Replaces the reference's trainer.py / runner.py / base_model.py / loss_meter.py /
external_libs/scheduler and its three uncoordinated config mechanisms
(SURVEY.md §2.6, §5) with one typed config tree.
"""

from .config import (
    OptimizerConfig,
    SchedulerConfig,
    GeneratorConfig,
    TrainConfig,
)
from .loss_meter import LossMap, LossMeter
from .schedule import make_epoch_lr_fn
from .train_state import TrainState, create_train_state, make_optimizer
from .trainer import Trainer

__all__ = [
    "OptimizerConfig",
    "SchedulerConfig",
    "GeneratorConfig",
    "TrainConfig",
    "LossMap",
    "LossMeter",
    "make_epoch_lr_fn",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "Trainer",
]
