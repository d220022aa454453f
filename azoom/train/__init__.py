from azoom.train.data import synth_batch
from azoom.train.loop import (
    TrainState,
    bce_loss,
    create_state,
    fit,
    make_train_step,
    mask_accuracy,
)

__all__ = [
    "synth_batch",
    "TrainState",
    "bce_loss",
    "create_state",
    "fit",
    "make_train_step",
    "mask_accuracy",
]
