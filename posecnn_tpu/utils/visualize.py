"""Result visualization: label overlays, projected 3D boxes, centers.

Replaces the reference's matplotlib debug displays
(ref: lib/fcn/test.py:815 vis_segmentations_vertmaps_detection,
gt_synthesize_layer/minibatch.py:580-675 _vis_minibatch) and the
pose-refinement visualization renderer (ref: lib/pose_refinement/
refinement.cpp) with PIL-based image composition — headless-friendly
(no GL, no display).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from posecnn_tpu.utils.quaternion import quat_to_mat
import jax.numpy as jnp


def label_to_color(label: np.ndarray, class_colors: np.ndarray) -> np.ndarray:
    """(H, W) int labels → (H, W, 3) uint8 color image."""
    return class_colors[np.clip(label, 0, len(class_colors) - 1)].astype(np.uint8)


def overlay_label(
    image_rgb: np.ndarray, label: np.ndarray, class_colors: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    color = label_to_color(label, class_colors).astype(np.float32)
    out = image_rgb.astype(np.float32).copy()
    mask = (label > 0)[..., None]
    out = np.where(mask, (1 - alpha) * out + alpha * color, out)
    return np.clip(out, 0, 255).astype(np.uint8)


def project_box_corners(
    quat: np.ndarray, trans: np.ndarray, extent: np.ndarray, k: np.ndarray
) -> np.ndarray:
    """(8, 2) image-plane corners of the pose's 3D extent box."""
    xh, yh, zh = np.asarray(extent, np.float64) * 0.5
    corners = np.array(
        [[sx * xh, sy * yh, sz * zh] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    r = np.asarray(quat_to_mat(jnp.asarray(np.asarray(quat, np.float32))))
    cam = corners @ r.T + np.asarray(trans)
    z = np.maximum(cam[:, 2], 1e-6)
    u = k[0, 0] * cam[:, 0] / z + k[0, 2]
    v = k[1, 1] * cam[:, 1] / z + k[1, 2]
    return np.stack([u, v], 1)


_BOX_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),  # z− face
    (4, 5), (4, 6), (5, 7), (6, 7),  # z+ face
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_detections(
    image_rgb: np.ndarray,
    detections: Sequence,  # [(cls, quat, trans)]
    extents: np.ndarray,
    k: np.ndarray,
    class_colors: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """Draw projected 3D boxes per detection; returns uint8 RGB."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.clip(image_rgb, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for cls, quat, trans in detections:
        cls = int(cls)
        color = (
            tuple(int(c) for c in class_colors[cls]) if class_colors is not None else (255, 0, 0)
        )
        uv = project_box_corners(quat, trans, extents[cls], k)
        for a, b in _BOX_EDGES:
            draw.line(
                [tuple(uv[a]), tuple(uv[b])], fill=color, width=2
            )
        if class_names is not None:
            draw.text((float(uv[:, 0].min()), float(uv[:, 1].min()) - 10), class_names[cls], fill=color)
    return np.asarray(img)


def save_image(path: str, image_rgb: np.ndarray):
    from PIL import Image

    Image.fromarray(np.clip(image_rgb, 0, 255).astype(np.uint8)).save(path)
