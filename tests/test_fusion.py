"""TSDF fusion / raycast / tracking / surface extraction tests on an
analytic scene (a flat wall at known depth)."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.refine.fusion import (
    create_volume,
    extract_surface,
    fuse_frame,
    raycast,
    track_camera,
)

H, W = 60, 80
K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
IDENTITY = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)


def make_wall_volume(wall_z=1.0, num_classes=3, wall_cls=2, frames=3):
    vol = create_volume(48, num_classes, origin=(-0.6, -0.6, 0.5), voxel_size=0.025)
    depth = np.full((H, W), wall_z, np.float32)
    prob = np.zeros((H, W, num_classes), np.float32)
    prob[..., wall_cls] = 1.0
    for _ in range(frames):
        vol = fuse_frame(
            vol, jnp.asarray(depth), jnp.asarray(prob), jnp.asarray(K), jnp.asarray(IDENTITY)
        )
    return vol, depth


def test_fuse_creates_zero_crossing_at_wall():
    vol, _ = make_wall_volume(wall_z=1.0)
    tsdf = np.asarray(vol.tsdf)
    # voxel layer just in front of the wall: positive; behind: <= 0
    # z index for 0.975m ≈ (0.975-0.5)/0.025 = 19 ; for 1.05m = 22
    assert float(vol.weight.max()) >= 3.0
    center = tsdf[24, 24, :]
    front = center[16]  # z = 0.9 → sdf +0.1 → clipped +1
    back = center[21]  # z = 1.025 → sdf −0.025/τ0.04 = −0.625
    untouched = center[23]  # z = 1.075 → beyond −τ, never updated → +1
    assert front > 0.5
    assert back < -0.3
    assert untouched == 1.0


def test_raycast_recovers_wall_depth():
    vol, _ = make_wall_volume(wall_z=1.0)
    depth, pts, labels = raycast(
        vol, jnp.asarray(K), jnp.asarray(IDENTITY), height=H, width=W,
        near=0.55, far=1.6, num_steps=128,
    )
    d = np.asarray(depth)
    inner = d[20:40, 25:55]
    assert (inner > 0).mean() > 0.9
    np.testing.assert_allclose(inner[inner > 0], 1.0, atol=0.03)
    # labels at hits carry the fused class
    lab = np.asarray(labels)[20:40, 25:55]
    assert (lab[inner > 0] == 2).mean() > 0.95


def test_track_camera_recovers_z_shift():
    vol, depth = make_wall_volume(wall_z=1.0)
    model_depth, _, _ = raycast(
        vol, jnp.asarray(K), jnp.asarray(IDENTITY), height=H, width=W,
        near=0.55, far=1.6, num_steps=128,
    )
    # new frame: wall appears at 0.97 → camera moved +0.03 in z
    depth_new = np.full((H, W), 0.97, np.float32)
    rt = track_camera(
        jnp.asarray(depth_new), model_depth, jnp.asarray(K), jnp.asarray(IDENTITY),
        num_iters=8,
    )
    t = np.asarray(rt[:, 3])
    assert abs(t[2] - 0.03) < 0.01, t
    # rotation stays near identity
    assert np.allclose(np.asarray(rt[:, :3]), np.eye(3), atol=0.02)


def test_extract_surface_points_on_wall():
    vol, _ = make_wall_volume(wall_z=1.0)
    pts, labels, valid = extract_surface(vol, max_points=4096)
    p = np.asarray(pts)[np.asarray(valid)]
    l_ = np.asarray(labels)[np.asarray(valid)]
    assert p.shape[0] > 100
    # surface points concentrate near z = 1.0
    assert abs(np.median(p[:, 2]) - 1.0) < 0.05
    assert (l_ == 2).mean() > 0.9
