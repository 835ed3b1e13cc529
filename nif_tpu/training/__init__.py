from .callbacks import (
    Callback,
    CheckpointCallback,
    CSVLogger,
    LearningRateScheduler,
    LossPrintingCallback,
    TensorBoardCallback,
)
from .checkpoint import Checkpointer
from .grouped import GroupedTrainer
from .trainer import Trainer, TrainState, make_loss_fn, make_train_step

__all__ = [
    "Trainer",
    "GroupedTrainer",
    "TrainState",
    "make_train_step",
    "make_loss_fn",
    "Checkpointer",
    "Callback",
    "LossPrintingCallback",
    "CSVLogger",
    "CheckpointCallback",
    "TensorBoardCallback",
    "LearningRateScheduler",
]
