"""Image augmentation (host-side NumPy).

Parity with the reference's blob augmentations
(ref: lib/utils/blob.py:74-131): chromatic shift in HSV (hue/
saturation/value jitter) and additive Gaussian noise, applied to the
raw image before mean subtraction.
"""

from __future__ import annotations

import numpy as np


def rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """Vectorized RGB→HSV on [0,255] float arrays, H in [0,360)."""
    rgb = rgb / 255.0
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-10), 0.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    safe = np.maximum(delta, 1e-10)
    h = np.where(
        maxc == r,
        (g - b) / safe % 6.0,
        np.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = np.where(delta > 0, h * 60.0, 0.0)
    return np.stack([h, s, v], -1)


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = v * s
    hp = (h / 60.0) % 6.0
    x = c * (1 - np.abs(hp % 2 - 1))
    z = np.zeros_like(c)
    conds = [
        (hp < 1, np.stack([c, x, z], -1)),
        ((hp >= 1) & (hp < 2), np.stack([x, c, z], -1)),
        ((hp >= 2) & (hp < 3), np.stack([z, c, x], -1)),
        ((hp >= 3) & (hp < 4), np.stack([z, x, c], -1)),
        ((hp >= 4) & (hp < 5), np.stack([x, z, c], -1)),
        (hp >= 5, np.stack([c, z, x], -1)),
    ]
    rgb = np.zeros(hsv.shape, hsv.dtype)
    for cond, val in conds:
        rgb = np.where(cond[..., None], val, rgb)
    m = (v - c)[..., None]
    return (rgb + m) * 255.0


def chromatic_transform(
    im: np.ndarray,
    rng: np.random.RandomState,
    d_h: float = 0.1,
    d_s: float = 0.1,
    d_l: float = 0.1,
) -> np.ndarray:
    """Random hue/saturation/lightness jitter
    (ref: chromatic_transform lib/utils/blob.py:74-106)."""
    hsv = rgb_to_hsv(im.astype(np.float32))
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-d_h, d_h) * 360.0) % 360.0
    hsv[..., 1] = np.clip(hsv[..., 1] + rng.uniform(-d_s, d_s), 0, 1)
    hsv[..., 2] = np.clip(hsv[..., 2] + rng.uniform(-d_l, d_l), 0, 1)
    return np.clip(hsv_to_rgb(hsv), 0, 255.0)


def add_noise(im: np.ndarray, rng: np.random.RandomState, level: float = 10.0) -> np.ndarray:
    """Additive Gaussian noise (ref: add_noise blob.py:109-131 applies
    gaussian or speckle noise)."""
    noise = rng.randn(*im.shape) * level
    return np.clip(im.astype(np.float32) + noise, 0, 255.0)
