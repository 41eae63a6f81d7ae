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

IMPORTANT — hand-batched, NOT vmapped. The original implementation
vmapped a per-RoI function over the RoI axis; on the TPU backend the
jitted gradient of that vmapped composition MISCOMPILES (jit(grad(·))
returns a different gradient than eager grad(·): quaternion components
1–2 come back ~10× too small, driving SGD to the identity rotation
regardless of target — reproduced and bisected in
experiments/logs/r3_repro{2,3,4}.log; eager-vs-jit maxdiff 0.267 with
vmap, 1.3e-3 without). CPU compiles the vmapped form correctly, which
is why every CPU golden/finite-diff test passed while on-chip training
never learned rotation. The explicit batched formulation below is
mathematically identical, compiles correctly on TPU (verified
eager≡jit on chip), and maps the Gram search onto batched MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import quat_to_mat

POSE_CHANNELS = 4


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
    c = points.shape[0]
    if num_valid is None:
        num_valid = jnp.asarray(n, jnp.float32)

    pred = pose_pred.astype(jnp.float32).reshape(n, c, POSE_CHANNELS)
    tgt = pose_target.astype(jnp.float32).reshape(n, c, POSE_CHANNELS)
    w4 = pose_weight.astype(jnp.float32).reshape(n, c, POSE_CHANNELS)
    pts_c = points.astype(jnp.float32)
    sym = symmetry.astype(jnp.float32)

    # first active class per RoI (ref: .cu.cc:48-55)
    active = w4[:, :, 0] > 0
    has_cls = jnp.any(active, axis=1)  # (N,)
    cls = jnp.argmax(active, axis=1)  # (N,)

    q_gt = jax.lax.stop_gradient(
        jnp.take_along_axis(tgt, cls[:, None, None], axis=1)[:, 0]
    )  # (N, 4)
    q_pred = jnp.take_along_axis(pred, cls[:, None, None], axis=1)[:, 0]
    pts = jnp.take(pts_c, cls, axis=0)  # (N, P, 3)

    r_pred = quat_to_mat(q_pred)  # (N, 3, 3)
    r_gt = quat_to_mat(q_gt)
    # x = pts @ R.T, batched over RoIs
    x1 = jnp.einsum("npk,njk->npj", pts, r_pred)
    x2 = jnp.einsum("npk,njk->npj", pts, r_gt)

    # symmetric nearest-neighbor match on the MXU (ref: .cu.cc:152-171)
    gram = jnp.einsum("npk,nqk->npq", x1, x2)  # (N, P, P)
    pair_sq = (
        jnp.sum(x1 * x1, -1)[:, :, None] - 2.0 * gram + jnp.sum(x2 * x2, -1)[:, None, :]
    )
    idx_min = jax.lax.stop_gradient(jnp.argmin(pair_sq, axis=2))  # (N, P)
    x2_sym = jnp.take_along_axis(x2, idx_min[:, :, None], axis=1)

    is_sym = jnp.take(sym, cls) > 0  # (N,)
    x2_sel = jnp.where(is_sym[:, None, None], x2_sym, x2)

    d2 = jnp.sum((x1 - x2_sel) ** 2, axis=-1)  # (N, P)
    hinged = jnp.maximum(d2 - margin, 0.0)  # (ref: .cu.cc:177-181)
    per_roi = jnp.where(has_cls, jnp.sum(hinged, axis=1), 0.0)

    denom = 2.0 * jnp.maximum(num_valid.astype(jnp.float32), 1.0) * p
    return jnp.sum(per_roi) / denom
