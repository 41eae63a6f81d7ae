from posecnn_tpu.engine.train import (
    TrainState,
    compute_losses,
    create_optimizer,
    create_train_state,
    make_train_step,
    train_loop,
)

__all__ = [
    "TrainState",
    "compute_losses",
    "create_optimizer",
    "create_train_state",
    "make_train_step",
    "train_loop",
]
