"""RANSAC center / 3D pose estimation tests with outliers."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.refine.ransac import estimate_center, estimate_pose_3d
from posecnn_tpu.utils.quaternion import quat_to_mat


def test_estimate_center_with_outliers(rng):
    n = 256
    true_c = np.array([80.0, 60.0])
    px = rng.rand(n, 2) * np.array([160, 120])
    d = true_c - px
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # corrupt 25% with random directions
    n_bad = n // 4
    bad = rng.rand(n_bad, 2) - 0.5
    d[:n_bad] = bad / np.linalg.norm(bad, axis=1, keepdims=True)
    est = estimate_center(
        jnp.asarray(px, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(0), num_hypotheses=128,
    )
    np.testing.assert_allclose(np.asarray(est.center), true_c, atol=2.0)
    assert float(est.score) > 0.5


def test_estimate_pose_3d_with_outliers(rng):
    n = 300
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    r_true = np.asarray(quat_to_mat(jnp.asarray(q, jnp.float32)))
    t_true = np.array([0.1, -0.05, 0.9], np.float32)
    obj = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.2
    cam = obj @ r_true.T + t_true + rng.randn(n, 3).astype(np.float32) * 0.002
    # 30% outliers
    n_bad = n * 3 // 10
    cam[:n_bad] += rng.rand(n_bad, 3) * 0.5
    est = estimate_pose_3d(
        jnp.asarray(obj), jnp.asarray(cam), jnp.ones(n, bool),
        jax.random.PRNGKey(1), num_hypotheses=256, inlier_threshold=0.01,
    )
    r_err = np.degrees(
        np.arccos(np.clip(0.5 * (np.trace(np.asarray(est.rotation) @ r_true.T) - 1), -1, 1))
    )
    t_err = np.linalg.norm(np.asarray(est.translation) - t_true)
    assert r_err < 3.0, r_err
    assert t_err < 0.01, t_err
    assert float(est.score) > 0.5


def test_estimate_pose_degenerate_all_invalid(rng):
    n = 50
    est = estimate_pose_3d(
        jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.zeros(n, bool),
        jax.random.PRNGKey(0), num_hypotheses=32,
    )
    assert np.all(np.isfinite(np.asarray(est.rotation)))
    assert float(est.inliers) == 0


def test_estimate_center_with_padding(rng):
    """Fixed-shape padding: only 10% of slots valid — hypotheses must
    still come from valid entries (review finding regression)."""
    n, nv = 500, 50
    true_c = np.array([80.0, 60.0])
    px = rng.rand(n, 2) * np.array([160, 120])
    d = true_c - px
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    valid = np.zeros(n, bool)
    valid[:nv] = True
    d[nv:] = 0  # garbage in padded slots
    est = estimate_center(
        jnp.asarray(px, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(valid), jax.random.PRNGKey(3), num_hypotheses=64,
    )
    np.testing.assert_allclose(np.asarray(est.center), true_c, atol=2.0)
    assert float(est.score) > 0.5


def test_estimate_pose_3d_with_padding(rng):
    n, nv = 400, 60
    q = rng.randn(4); q /= np.linalg.norm(q)
    r_true = np.asarray(quat_to_mat(jnp.asarray(q, jnp.float32)))
    t_true = np.array([0.05, 0.0, 0.8], np.float32)
    obj = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.2
    cam = obj @ r_true.T + t_true
    valid = np.zeros(n, bool); valid[:nv] = True
    cam[nv:] = 99.0  # garbage padding
    est = estimate_pose_3d(
        jnp.asarray(obj), jnp.asarray(cam), jnp.asarray(valid),
        jax.random.PRNGKey(5), num_hypotheses=128, inlier_threshold=0.01,
    )
    t_err = np.linalg.norm(np.asarray(est.translation) - t_true)
    assert t_err < 0.01, t_err
    assert float(est.score) > 0.9
