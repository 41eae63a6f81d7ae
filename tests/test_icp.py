"""ICP refinement: recover a perturbed pose against synthetic depth.

Renders depth of a dense synthetic object (sphere-ish blob) at a true
pose via point splatting, perturbs the pose, and checks the batched
Gauss-Newton point-plane ICP reduces both rotation and translation
error (the reference's solveICP role, synthesize.cpp:2052-2381)."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.refine.icp import refine_pose_icp
from posecnn_tpu.ops.normals import backproject_depth, depth_to_normals
from posecnn_tpu.utils.quaternion import quat_to_mat

H, W = 120, 160
FX = FY = 180.0
PX, PY = W / 2, H / 2
K = np.array([[FX, 0, PX], [0, FY, PY], [0, 0, 1]], np.float32)


def make_model(rng, n=1800):
    # cuboid surface (0.12×0.08×0.06): flat faces with 3 distinct
    # normals give point-plane ICP full orientation observability
    # (a smooth ellipsoid is nearly rotation-ambiguous)
    half = np.array([0.06, 0.04, 0.03])
    pts = []
    per_face = n // 6
    for axis in range(3):
        for sign in (-1, 1):
            q = rng.uniform(-1, 1, (per_face, 3)) * half
            q[:, axis] = sign * half[axis]
            pts.append(q)
    return np.concatenate(pts).astype(np.float32)


def render_depth(pts, q, t):
    r = np.asarray(quat_to_mat(jnp.asarray(q)))
    p = pts @ r.T + t
    depth = np.full((H, W), np.inf, np.float32)
    z = p[:, 2]
    u = np.round(FX * p[:, 0] / z + PX).astype(int)
    v = np.round(FY * p[:, 1] / z + PY).astype(int)
    for du in (-1, 0, 1):
        for dv in (-1, 0, 1):
            uu, vv = u + du, v + dv
            ok = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
            np.minimum.at(depth, (vv[ok], uu[ok]), z[ok])
    depth[np.isinf(depth)] = 0
    return depth


def pose_errors(q_est, t_est, q_gt, t_gt):
    r_est = np.asarray(quat_to_mat(jnp.asarray(np.asarray(q_est))))
    r_gt = np.asarray(quat_to_mat(jnp.asarray(q_gt)))
    cos = np.clip(0.5 * (np.trace(r_est @ r_gt.T) - 1), -1, 1)
    return np.degrees(np.arccos(cos)), np.linalg.norm(np.asarray(t_est) - t_gt)


def test_normals_of_plane():
    # flat wall at z=1 → normals ≈ (0, 0, -1)
    depth = jnp.ones((40, 40))
    n = depth_to_normals(depth, FX, FY, 20.0, 20.0)
    inner = np.asarray(n)[5:-5, 5:-5]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)


def test_backproject_roundtrip():
    depth = jnp.full((10, 10), 2.0)
    pts = backproject_depth(depth, FX, FY, 5.0, 5.0)
    assert np.allclose(np.asarray(pts)[..., 2], 2.0)
    # pixel (5,5) is the principal point → x=y=0
    np.testing.assert_allclose(np.asarray(pts)[5, 5], [0, 0, 2.0], atol=1e-6)


# angled base orientation: 2-3 cuboid faces visible, so point-plane
# ICP fully observes rotation (face-on, rotation about the view axis
# of a single plane is unobservable — a property of the formulation,
# not a bug)
BASE_Q = np.array([np.cos(0.3), 0.25, 0.25, 0.05], np.float32)
BASE_Q /= np.linalg.norm(BASE_Q)


def test_icp_recovers_translation_offset(rng):
    pts = make_model(rng)
    t_gt = np.array([0.05, -0.02, 0.9], np.float32)
    depth = render_depth(pts, BASE_Q, t_gt)
    mask = depth > 0
    t0 = t_gt + np.array([0.015, 0.01, 0.03], np.float32)

    res = refine_pose_icp(
        jnp.asarray(BASE_Q), jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(depth),
        jnp.asarray(mask), jnp.asarray(K), num_iters=16,
    )
    rot0, tr0 = pose_errors(BASE_Q, t0, BASE_Q, t_gt)
    rot1, tr1 = pose_errors(res.quat, res.trans, BASE_Q, t_gt)
    assert np.isfinite(tr1)
    assert tr1 < 0.5 * tr0, (tr0, tr1)
    assert tr1 < 0.015  # within 1.5 cm (splat-render bias ~4 mm)
    assert float(res.score) > 0.3


def test_icp_recovers_small_rotation(rng):
    from posecnn_tpu.utils.quaternion import quat_mul

    pts = make_model(rng)
    t_gt = np.array([0.0, 0.0, 0.8], np.float32)
    depth = render_depth(pts, BASE_Q, t_gt)
    mask = depth > 0
    ang = np.radians(8.0)
    dq = np.array([np.cos(ang / 2), np.sin(ang / 2), 0, 0], np.float32)
    q0 = np.asarray(quat_mul(jnp.asarray(dq), jnp.asarray(BASE_Q)))

    res = refine_pose_icp(
        jnp.asarray(q0), jnp.asarray(t_gt), jnp.asarray(pts), jnp.asarray(depth),
        jnp.asarray(mask), jnp.asarray(K), num_iters=16,
    )
    rot0, _ = pose_errors(q0, t_gt, BASE_Q, t_gt)
    rot1, tr1 = pose_errors(res.quat, res.trans, BASE_Q, t_gt)
    assert rot1 < 0.6 * rot0, (rot0, rot1)
    assert tr1 < 0.02


def test_icp_rotation_hypotheses_escape_gn_basin(rng):
    """A 25° initial rotation error sits outside the point-plane GN
    basin; the rotation-hypothesis sweep (rot_perturb) recovers it
    (the reference's Nelder-Mead pose polish role,
    synthesize.cpp:2172-2199)."""
    from posecnn_tpu.utils.quaternion import axis_angle_to_quat, quat_mul

    pts = make_model(rng)
    t_gt = np.array([0.03, -0.01, 0.85], np.float32)
    depth = render_depth(pts, BASE_Q, t_gt)
    mask = depth > 0
    ang = np.radians(25.0)
    axis = np.array([0.5, 0.8, 0.2], np.float32)
    dq = np.asarray(
        axis_angle_to_quat(jnp.asarray(axis), jnp.asarray(np.float32(ang)))
    )
    q0 = np.asarray(quat_mul(jnp.asarray(dq), jnp.asarray(BASE_Q)))
    t0 = t_gt + np.array([0.01, -0.005, 0.02], np.float32)

    errs = {}
    for rp in (0.0, 0.25):
        res = refine_pose_icp(
            jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(pts),
            jnp.asarray(depth), jnp.asarray(mask),
            jnp.asarray(K), num_iters=12, rot_perturb=rp,
        )
        errs[rp] = pose_errors(np.asarray(res.quat), np.asarray(res.trans),
                               BASE_Q, t_gt)
    # the sweep must beat plain GN by a clear margin and land under 8°
    assert errs[0.25][0] < errs[0.0][0] - 1.0
    assert errs[0.25][0] < 8.0
    assert errs[0.25][1] < 0.02
