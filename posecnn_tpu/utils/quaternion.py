"""Quaternion / rotation utilities in pure JAX (batchable, jit-safe).

Convention: quaternions are (w, x, y, z), matching the reference's
Eigen::Quaternionf(pose[6..9]) usage (ref:
lib/hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc:140) and the
rotation-matrix expansion in the ADD loss kernel (ref:
lib/average_distance_loss/average_distance_loss_op_gpu.cu.cc:62-89).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz quaternion → (…, 3, 3) rotation matrix.

    Matches the (unnormalized-quaternion) expansion used by the
    reference ADD loss (ref: average_distance_loss_op_gpu.cu.cc:62-89):
    no normalization is applied here, so gradients flow through the raw
    quaternion exactly as in the reference kernel.
    """
    s, u, v, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [s * s + u * u - v * v - w * w, 2 * (u * v - s * w), 2 * (u * w + s * v)], -1
    )
    row1 = jnp.stack(
        [2 * (u * v + s * w), s * s - u * u + v * v - w * w, 2 * (v * w - s * u)], -1
    )
    row2 = jnp.stack(
        [2 * (u * w - s * v), 2 * (v * w + s * u), s * s - u * u - v * v + w * w], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) rotation matrix → (…, 4) wxyz quaternion (w >= 0).

    Branch-free Shepperd's method: computes all four candidate
    solutions and selects by the largest diagonal combination, so it is
    jit/vmap-safe (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate 4*q_i^2 values
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate quaternions, each scaled by its dominant component
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], -1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], -1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], -1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], -1)

    cands = jnp.stack([cw, cx, cy, cz], -2)  # (..., 4cand, 4)
    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    idx = jnp.argmax(mags, axis=-1)
    best = jnp.take_along_axis(
        cands, idx[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    denom = 2.0 * safe_sqrt(jnp.take_along_axis(mags, idx[..., None], -1))
    q = best / denom
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, broadcastable."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_normalize(q: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-10)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], -1)


def rotation_geodesic_deg(r_est: jnp.ndarray, r_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees
    (ref: lib/utils/pose_error.py:92-105 `re`)."""
    rel = jnp.einsum("...ij,...kj->...ik", r_est, r_gt)  # R_est @ R_gt^T
    cos = 0.5 * (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0)
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


# --- NumPy host-side counterparts (data prep / CLI tools) ---

def quat_to_mat_np(q) -> "np.ndarray":
    """(4,) wxyz quaternion → (3, 3) rotation matrix, NumPy host-side
    (normalizing; ref: transforms3d quat2mat used throughout the
    reference data layer, e.g. gt_synthesize_layer/minibatch.py:373)."""
    import numpy as np

    q = np.asarray(q, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def mat_to_quat_np(m) -> "np.ndarray":
    """Rotation matrix → unit quaternion (w,x,y,z), NumPy host-side.
    Canonical alias of data.minibatch.mat_to_quat_np (Shepperd's
    method); imported lazily to avoid a utils→data import cycle at
    module load."""
    from posecnn_tpu.data.minibatch import mat_to_quat_np as _impl

    return _impl(m)


def axis_angle_to_quat_np(axis, angle) -> "np.ndarray":
    """NumPy counterpart of axis_angle_to_quat (host data path)."""
    import numpy as np

    a = np.asarray(axis, np.float64)
    a = a / (np.linalg.norm(a) + 1e-12)
    half = 0.5 * float(angle)
    return np.concatenate([[np.cos(half)], np.sin(half) * a]).astype(np.float32)


def quat_mul_np(a, b) -> "np.ndarray":
    """NumPy counterpart of quat_mul (wxyz Hamilton product)."""
    import numpy as np

    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        np.float32,
    )
