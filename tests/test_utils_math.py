"""Golden tests for quaternion/SE3/bbox/pose-error utilities against
independent NumPy constructions."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.utils.quaternion import (
    mat_to_quat,
    quat_mul,
    quat_normalize,
    quat_to_mat,
    rotation_geodesic_deg,
)
from posecnn_tpu.utils.se3 import se3_inverse, se3_mul, transform_points
from posecnn_tpu.utils.bbox import box_iou
from posecnn_tpu.utils import pose_error


def random_quat(rng, n=()):
    q = rng.randn(*n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_roundtrip(rng):
    q = random_quat(rng, (32,))
    q[:, 0] = np.abs(q[:, 0])  # canonical w>=0 for comparison
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    m = quat_to_mat(jnp.asarray(q))
    q2 = mat_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_quat_to_mat_is_rotation(rng):
    q = random_quat(rng, (16,))
    m = np.asarray(quat_to_mat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_quat_mul_matches_matmul(rng):
    a, b = random_quat(rng, (8,)), random_quat(rng, (8,))
    q_ab = quat_mul(jnp.asarray(a), jnp.asarray(b))
    m_ab = np.asarray(quat_to_mat(q_ab))
    m_ref = np.asarray(quat_to_mat(jnp.asarray(a))) @ np.asarray(quat_to_mat(jnp.asarray(b)))
    np.testing.assert_allclose(m_ab, m_ref, atol=1e-5)


def test_se3_mul_inverse(rng):
    q = random_quat(rng, (4,))
    r = np.asarray(quat_to_mat(jnp.asarray(q)))
    t = rng.randn(4, 3, 1)
    rt = jnp.asarray(np.concatenate([r, t], -1))
    ident = se3_mul(rt, se3_inverse(rt))
    expect = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], -1), (4, 1, 1))
    np.testing.assert_allclose(np.asarray(ident), expect, atol=1e-5)


def test_transform_points_matches_numpy(rng):
    q = random_quat(rng)
    r = np.asarray(quat_to_mat(jnp.asarray(q)))
    t = rng.randn(3)
    pts = rng.randn(50, 3)
    out = transform_points(jnp.asarray(np.concatenate([r, t[:, None]], -1)), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), pts @ r.T + t, atol=1e-5)


def test_box_iou_reference_convention():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])  # 10×10 with the +1 convention
    b = jnp.asarray([[5.0, 5.0, 14.0, 14.0]])
    iou = float(box_iou(a, b)[0, 0])
    # intersection 5×5=25, union 100+100−25=175 (ref +1 convention)
    np.testing.assert_allclose(iou, 25.0 / 175.0, atol=1e-6)


def test_add_adi_errors(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    r = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    t2 = np.array([0.05, 0.0, 0.0], np.float32)
    add = float(pose_error.add_error(jnp.asarray(r), jnp.asarray(t2), jnp.asarray(r), jnp.asarray(t1), jnp.asarray(pts)))
    np.testing.assert_allclose(add, 0.05, atol=1e-6)
    # identical poses → adi 0
    # Gram-matrix pairwise distance has ~1e-7 cancellation in d²,
    # i.e. ~5e-4 in d — sub-millimeter, fine for the metric.
    adi = float(pose_error.adi_error(jnp.asarray(r), jnp.asarray(t1), jnp.asarray(r), jnp.asarray(t1), jnp.asarray(pts)))
    np.testing.assert_allclose(adi, 0.0, atol=5e-4)
    # adi ≤ add always
    q = np.asarray(quat_to_mat(quat_normalize(jnp.asarray(rng.randn(4)))))
    adi2 = float(pose_error.adi_error(jnp.asarray(q), jnp.asarray(t2), jnp.asarray(r), jnp.asarray(t1), jnp.asarray(pts)))
    add2 = float(pose_error.add_error(jnp.asarray(q), jnp.asarray(t2), jnp.asarray(r), jnp.asarray(t1), jnp.asarray(pts)))
    assert adi2 <= add2 + 1e-6


def test_rotation_geodesic(rng):
    # 30° rotation about z
    ang = np.pi / 6
    r = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    deg = float(rotation_geodesic_deg(jnp.asarray(r), jnp.eye(3)))
    np.testing.assert_allclose(deg, 30.0, atol=1e-4)


def test_auc_of_errors():
    errors = jnp.asarray([0.0, 0.05, 0.2])  # third always fails at 0.1 max
    auc = float(pose_error.auc_of_errors(errors, max_threshold=0.1))
    assert 0.4 < auc < 0.6
