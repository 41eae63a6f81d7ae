from posecnn_tpu.engine.train import (
    TrainState,
    compute_losses,
    compute_video_losses,
    GanTrainState,
    create_gan_train_state,
    create_optimizer,
    create_train_state,
    lr_schedule,
    make_det_train_step,
    make_gan_train_step,
    make_train_step,
    train_loop,
)
from posecnn_tpu.engine.evaluate import (
    PoseEvaluator,
    extract_detections,
    fast_hist,
    iou_from_hist,
)

__all__ = [
    "TrainState",
    "compute_losses",
    "compute_video_losses",
    "GanTrainState",
    "create_gan_train_state",
    "create_optimizer",
    "create_train_state",
    "lr_schedule",
    "make_train_step",
    "make_det_train_step",
    "make_gan_train_step",
    "train_loop",
    "PoseEvaluator",
    "extract_detections",
    "fast_hist",
    "iou_from_hist",
]
