from posecnn_tpu.ops.hard_label import hard_label
from posecnn_tpu.ops.losses import (
    loss_cross_entropy_single_frame,
    loss_quaternion,
    smooth_l1_loss,
    smooth_l1_loss_vertex,
)
from posecnn_tpu.ops.gradient_reversal import gradient_reversal
from posecnn_tpu.ops.hough_voting import hough_voting
from posecnn_tpu.ops.add_loss import average_distance_loss
from posecnn_tpu.ops.roi_align import roi_pool_fused
from posecnn_tpu.ops.nms import nms

__all__ = [
    "hard_label",
    "loss_cross_entropy_single_frame",
    "loss_quaternion",
    "smooth_l1_loss",
    "smooth_l1_loss_vertex",
    "gradient_reversal",
    "hough_voting",
    "average_distance_loss",
    "roi_pool_fused",
    "nms",
]
