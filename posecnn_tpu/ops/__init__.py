from posecnn_tpu.ops.hard_label import hard_label
from posecnn_tpu.ops.losses import (
    loss_cross_entropy_single_frame,
    loss_quaternion,
    smooth_l1_loss,
    smooth_l1_loss_vertex,
    softmax_cross_entropy_with_logits,
)
from posecnn_tpu.ops.gradient_reversal import gradient_reversal
from posecnn_tpu.ops.hough_voting import HoughOutputs, hough_voting
from posecnn_tpu.ops.add_loss import average_distance_loss
from posecnn_tpu.ops.roi_align import roi_align, roi_pool_fused
from posecnn_tpu.ops.nms import nms, nms_per_class
from posecnn_tpu.ops.normals import backproject_depth, depth_to_normals
from posecnn_tpu.ops.flow import compute_flow
from posecnn_tpu.ops.voxel import backproject, compute_label, project
from posecnn_tpu.ops.embedding_losses import lifted_structured_loss, triplet_loss
from posecnn_tpu.ops.matching_loss import matching_loss, soft_silhouette
from posecnn_tpu.ops.rpn import (
    anchor_grid,
    anchor_target_layer,
    generate_anchors,
    proposal_layer,
    proposal_target_layer,
)

__all__ = [
    "hard_label",
    "loss_cross_entropy_single_frame",
    "loss_quaternion",
    "smooth_l1_loss",
    "smooth_l1_loss_vertex",
    "softmax_cross_entropy_with_logits",
    "gradient_reversal",
    "hough_voting",
    "HoughOutputs",
    "average_distance_loss",
    "roi_align",
    "roi_pool_fused",
    "nms",
    "nms_per_class",
    "backproject_depth",
    "depth_to_normals",
    "compute_flow",
    "backproject",
    "project",
    "compute_label",
    "triplet_loss",
    "lifted_structured_loss",
    "matching_loss",
    "soft_silhouette",
    "generate_anchors",
    "anchor_grid",
    "proposal_layer",
    "anchor_target_layer",
    "proposal_target_layer",
]
