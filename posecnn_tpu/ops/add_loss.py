"""Average-distance (ADD / ADD-S "SLoss") pose loss.

TPU-native equivalent of the `Averagedistance` CUDA op
(ref: lib/average_distance_loss/average_distance_loss_op_gpu.cu.cc:35-343).

Reference semantics reproduced exactly:
  * per RoI, the active class is the FIRST class slot with weight > 0
    (ref: .cu.cc:48-91);
  * rotation matrices are built from the RAW (unnormalized) predicted
    and target quaternions (ref: .cu.cc:62-89) — gradients flow through
    the un-normalized expansion;
  * for symmetric classes the target point is the closest
    GT-rotated model point to each predicted-rotated point
    (ref: .cu.cc:152-171) with the match index treated as a constant
    in the backward pass;
  * hinge: points with squared distance < margin contribute nothing
    (ref: .cu.cc:177-179);
  * loss = Σ_{n,p} (d² − margin) / (2·B·P)  (ref: .cu.cc:181).

TPU-first re-design: instead of a hand-written backward kernel the
hinged forward is written so `jax.grad` reproduces the reference
gradient (argmin index is non-differentiable ⇒ identical treatment to
the CUDA backward). The O(P²) symmetric nearest-neighbor search is a
Gram-matrix (−2·X₁X₂ᵀ + ‖·‖²) computed on the MXU in fp32 — this is
where the FLOPs are, and it is exactly a batched matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import quat_to_mat

POSE_CHANNELS = 4


def _per_roi_loss(pred_q4c, target_q4c, weight_q4c, points, symmetry, margin):
    """Loss terms for one RoI. points: (C, P, 3)."""
    num_classes = points.shape[0]
    w4 = weight_q4c.reshape(num_classes, POSE_CHANNELS)
    has_cls = jnp.any(w4[:, 0] > 0)
    cls = jnp.argmax(w4[:, 0] > 0)  # first active class (ref: .cu.cc:48-55)

    q_gt = jax.lax.stop_gradient(
        jnp.take(target_q4c.reshape(num_classes, POSE_CHANNELS), cls, axis=0)
    )
    q_pred = jnp.take(pred_q4c.reshape(num_classes, POSE_CHANNELS), cls, axis=0)
    pts = jnp.take(points, cls, axis=0)  # (P, 3)

    r_pred = quat_to_mat(q_pred)
    r_gt = quat_to_mat(q_gt)
    x1 = pts @ r_pred.T  # predicted-rotated points (P, 3)
    x2 = pts @ r_gt.T  # GT-rotated points (P, 3)

    # symmetric nearest-neighbor match on the MXU (ref: .cu.cc:152-171)
    gram = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    pair_sq = (
        jnp.sum(x1 * x1, -1, keepdims=True) - 2.0 * gram + jnp.sum(x2 * x2, -1)[None, :]
    )
    idx_min = jax.lax.stop_gradient(jnp.argmin(pair_sq, axis=1))
    x2_sym = jnp.take(x2, idx_min, axis=0)

    is_sym = jnp.take(symmetry, cls) > 0
    x2_sel = jnp.where(is_sym, x2_sym, x2)

    d2 = jnp.sum((x1 - x2_sel) ** 2, axis=-1)
    hinged = jnp.maximum(d2 - margin, 0.0)  # (ref: .cu.cc:177-181)
    return jnp.where(has_cls, jnp.sum(hinged), 0.0)


def average_distance_loss(
    pose_pred: jnp.ndarray,
    pose_target: jnp.ndarray,
    pose_weight: jnp.ndarray,
    points: jnp.ndarray,
    symmetry: jnp.ndarray,
    margin: float = 0.01,
    num_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ADD(-S) loss over a batch of RoIs.

    Args:
      pose_pred:   (N, 4C) predicted quaternions per class slot.
      pose_target: (N, 4C) target quaternions.
      pose_weight: (N, 4C) 1s in the active class's 4 channels.
      points:      (C, P, 3) model points per class.
      symmetry:    (C,) >0 for symmetric classes.
      margin:      hinge margin on squared distance (ref default 0.01,
                   vgg16_convs.py:200).
      num_valid:   number of real (non-padded) RoIs. The reference op
                   normalizes by its dynamic batch size
                   (ref: .cu.cc:181); with our fixed MAX_ROI padding we
                   pass the true count instead. Defaults to N.

    Returns scalar loss.
    """
    n = pose_pred.shape[0]
    p = points.shape[1]
    if num_valid is None:
        num_valid = jnp.asarray(n, jnp.float32)
    per_roi = jax.vmap(_per_roi_loss, in_axes=(0, 0, 0, None, None, None))(
        pose_pred.astype(jnp.float32),
        pose_target.astype(jnp.float32),
        pose_weight.astype(jnp.float32),
        points.astype(jnp.float32),
        symmetry.astype(jnp.float32),
        margin,
    )
    denom = 2.0 * jnp.maximum(num_valid.astype(jnp.float32), 1.0) * p
    return jnp.sum(per_roi) / denom
