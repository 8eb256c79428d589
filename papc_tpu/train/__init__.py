"""papc_tpu.train — trainer, metrics, checkpointing."""

from papc_tpu.train.trainer import (
    TrainState,
    evaluate,
    create_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    train,
)

__all__ = [
    "train",
    "evaluate",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "save_checkpoint",
    "restore_checkpoint",
]
