"""Box utilities in JAX: IoU, transforms, clipping.

Replaces lib/utils/bbox_transform.py:13-79 and the CUDA IoU helper
(ref: lib/hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc:73-82) with
vectorized, jit-safe equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (…, N, 4) and (…, M, 4) xyxy boxes with the
    reference's +1 pixel-area convention
    (ref: hough_voting_gpu_op.cu.cc:73-82)."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    left = jnp.maximum(a[..., 0], b[..., 0])
    top = jnp.maximum(a[..., 1], b[..., 1])
    right = jnp.minimum(a[..., 2], b[..., 2])
    bottom = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.maximum(right - left + 1.0, 0.0)
    ih = jnp.maximum(bottom - top + 1.0, 0.0)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0)
    area_b = (b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-10)


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Box → regression targets (ref: lib/utils/bbox_transform.py:13-33)."""
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h
    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h
    return jnp.stack(
        [
            (gt_cx - ex_cx) / ex_w,
            (gt_cy - ex_cy) / ex_h,
            jnp.log(gt_w / ex_w),
            jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply regression deltas (…, N, 4k) to (…, N, 4) boxes
    (ref: lib/utils/bbox_transform.py:36-64)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    dw = deltas[..., 2::4]
    dh = deltas[..., 3::4]

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (ref: bbox_transform.py:67-79)."""
    x1 = jnp.clip(boxes[..., 0::4], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1::4], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2::4], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3::4], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)
