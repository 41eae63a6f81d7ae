"""Minibatch blob construction (host-side NumPy, feeds the device).

Replaces the reference data layer's per-sample python loops
(ref: lib/gt_synthesize_layer/minibatch.py) with vectorized NumPy.
Blob semantics are identical:

  vertex targets — per labeled pixel of class c, channels
    [3c, 3c+1] = unit direction (center − pixel), 3c+2 = log z
    (ref: _generate_vertex_targets minibatch.py:517-577)
  vertex weights — VERTEX_W_INSIDE on all 3 channels of labeled
    pixels (ref: minibatch.py:545-548)
  meta blob — 48 floats [K(9), K⁻¹(9), pose_world2live(12),
    pose_live2world(12), voxel step(3), voxel min(3)]
    (ref: lib/fcn/test.py:121-149)
  pose blob — (N, 13) rows [batch, cls, center_x?, …, quat(6:10),
    t(10:13)] (ref: minibatch.py pose_blob assembly)
"""

from __future__ import annotations

import numpy as np


def generate_vertex_targets(
    im_label: np.ndarray,
    cls_indexes: np.ndarray,
    centers: np.ndarray,
    zs: np.ndarray,
    num_classes: int,
    vertex_w_inside: float = 10.0,
):
    """Vectorized vertex-target construction for one image.

    Args:
      im_label: (H, W) int — per-pixel class labels.
      cls_indexes: (N,) int — class id of each GT instance.
      centers: (N, 2) float — projected object centers (x, y).
      zs: (N,) float — object depths (camera z).
      num_classes: C.

    Returns (vertex_targets (H, W, 3C), vertex_weights (H, W, 3C)).
    Matches minibatch.py:550-575 (single-instance-per-class path: the
    instance whose class matches the pixel label claims the pixel).
    """
    h, w = im_label.shape
    targets = np.zeros((h, w, 3 * num_classes), np.float32)
    weights = np.zeros((h, w, 3 * num_classes), np.float32)
    ys, xs = np.nonzero(im_label > 0)
    if len(ys) == 0:
        return targets, weights
    labels_at = im_label[ys, xs]
    # map class id -> instance row (first instance of that class)
    cls_to_inst = -np.ones(num_classes, np.int64)
    for i, c in enumerate(cls_indexes):
        if cls_to_inst[int(c)] == -1:
            cls_to_inst[int(c)] = i
    inst = cls_to_inst[labels_at]
    ok = inst >= 0
    ys, xs, labels_at, inst = ys[ok], xs[ok], labels_at[ok], inst[ok]
    cx = centers[inst, 0]
    cy = centers[inst, 1]
    dx = cx - xs
    dy = cy - ys
    norm = np.sqrt(dx * dx + dy * dy) + 1e-10  # (ref: minibatch.py:560)
    base = 3 * labels_at
    targets[ys, xs, base + 0] = dx / norm
    targets[ys, xs, base + 1] = dy / norm
    targets[ys, xs, base + 2] = np.log(zs[inst])
    for off in range(3):
        weights[ys, xs, base + off] = vertex_w_inside
    return targets, weights


def build_meta_blob(
    k: np.ndarray,
    pose_world2live: np.ndarray | None = None,
    pose_live2world: np.ndarray | None = None,
    voxel_step=(0.0, 0.0, 0.0),
    voxel_min=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """48-float meta blob (ref layout: lib/fcn/test.py:121-149)."""
    meta = np.zeros(48, np.float32)
    meta[0:9] = np.asarray(k, np.float32).flatten()
    meta[9:18] = np.linalg.pinv(np.asarray(k, np.float64)).astype(np.float32).flatten()
    if pose_world2live is not None:
        meta[18:30] = np.asarray(pose_world2live, np.float32).flatten()
    if pose_live2world is not None:
        meta[30:42] = np.asarray(pose_live2world, np.float32).flatten()
    meta[42:45] = voxel_step
    meta[45:48] = voxel_min
    return meta


def build_pose_blob(
    batch_index: int,
    cls_indexes: np.ndarray,
    quats: np.ndarray,
    translations: np.ndarray,
    centers: np.ndarray | None = None,
) -> np.ndarray:
    """(N, 13) GT pose rows (ref: minibatch.py pose_blob layout:
    [batch, cls, center(2:6 misc), quat(6:10), t(10:13)])."""
    n = len(cls_indexes)
    blob = np.zeros((n, 13), np.float32)
    blob[:, 0] = batch_index
    blob[:, 1] = cls_indexes
    if centers is not None:
        blob[:, 2:4] = centers
    blob[:, 6:10] = quats
    blob[:, 10:13] = translations
    return blob


def pad_image_blob(ims: list[np.ndarray], pixel_means: np.ndarray, stride: int = 16):
    """Stack images into a batch blob, mean-subtracted, padded to a
    stride multiple (ref: lib/utils/blob.py:13-72 im_list_to_blob +
    pad_im(·,16))."""
    max_h = max(im.shape[0] for im in ims)
    max_w = max(im.shape[1] for im in ims)
    ph = (max_h + stride - 1) // stride * stride
    pw = (max_w + stride - 1) // stride * stride
    blob = np.zeros((len(ims), ph, pw, 3), np.float32)
    for i, im in enumerate(ims):
        blob[i, : im.shape[0], : im.shape[1], :] = im.astype(np.float32) - pixel_means
    return blob


def label_to_boxes(im_label: np.ndarray, cls_indexes: np.ndarray) -> np.ndarray:
    """GT boxes (N, 5) [x1,y1,x2,y2,cls] from a label map — the roidb
    box source for detection training (ref: gt_roidb box assembly in
    lib/datasets/*.py)."""
    boxes = []
    for c in cls_indexes:
        ys, xs = np.nonzero(im_label == int(c))
        if len(ys) == 0:
            continue
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max(), int(c)])
    if not boxes:
        return np.zeros((0, 5), np.float32)
    return np.asarray(boxes, np.float32)
