"""SE(3) helpers (ref: lib/utils/se3.py:11-31) in JAX, batchable."""

from __future__ import annotations

import jax.numpy as jnp


def se3_mul(rt1: jnp.ndarray, rt2: jnp.ndarray) -> jnp.ndarray:
    """Compose two (…, 3, 4) [R|t] transforms: rt1 ∘ rt2
    (ref: lib/utils/se3.py se3_mul)."""
    r = rt1[..., :3, :3] @ rt2[..., :3, :3]
    t = (rt1[..., :3, :3] @ rt2[..., :3, 3:4]) + rt1[..., :3, 3:4]
    return jnp.concatenate([r, t], axis=-1)


def se3_inverse(rt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an (…, 3, 4) [R|t] transform
    (ref: lib/utils/se3.py se3_inverse)."""
    r_t = jnp.swapaxes(rt[..., :3, :3], -1, -2)
    t = -r_t @ rt[..., :3, 3:4]
    return jnp.concatenate([r_t, t], axis=-1)


def transform_points(rt: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (…, 3, 4) [R|t] to (…, N, 3) points → (…, N, 3)
    (ref: lib/utils/pose_error.py:12-23 transform_pts_Rt)."""
    return pts @ jnp.swapaxes(rt[..., :3, :3], -1, -2) + rt[..., None, :3, 3]
