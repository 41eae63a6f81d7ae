"""Secondary model families + supporting ops: flow warp, voxel ops,
embedding losses, recurrent video net, ResNet50 seg, FCN8, detection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.data.minibatch import build_meta_blob

C = 4
H, W = 32, 48
K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)


def identity_meta(batch=1):
    pose_id = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    meta = build_meta_blob(K, pose_id, pose_id)
    return np.tile(meta[None], (batch, 1))


def test_compute_flow_identity_pose_roundtrip():
    """With identity relative pose and consistent depth, the warp must
    return the previous state unchanged (within neighborhood avg)."""
    from posecnn_tpu.ops.flow import compute_flow

    rng = np.random.RandomState(0)
    depth = np.full((1, H, W), 1.5, np.float32)
    meta = identity_meta()
    # previous points: backprojection of the same depth
    from posecnn_tpu.ops.normals import backproject_depth

    pts = np.asarray(backproject_depth(jnp.asarray(depth[0]), K[0, 0], K[1, 1], K[0, 2], K[1, 2]))
    state = rng.rand(1, H, W, 8).astype(np.float32)
    weights = np.ones((1, H, W, 8), np.float32)

    ws, ww, pcur = compute_flow(
        jnp.asarray(state), jnp.asarray(weights), jnp.asarray(pts[None]),
        jnp.asarray(depth), jnp.asarray(meta), kernel_size=0,
    )
    np.testing.assert_allclose(np.asarray(ws), state, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ww), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pcur)[0, :, :, 2], 1.5, atol=1e-5)


def test_compute_flow_translation_shift():
    """Camera shifted right by one pixel's worth: the warp reads the
    previous state one pixel over."""
    from posecnn_tpu.ops.flow import compute_flow
    from posecnn_tpu.ops.normals import backproject_depth

    depth_val, fx = 2.0, K[0, 0]
    shift_x = depth_val / fx  # world shift that maps to exactly 1 px
    pose_l2w = np.concatenate([np.eye(3), np.array([[shift_x], [0], [0]])], 1)
    meta = build_meta_blob(K, pose_l2w, pose_l2w)[None]
    depth = np.full((1, H, W), depth_val, np.float32)
    pts = np.asarray(backproject_depth(jnp.asarray(depth[0]), K[0, 0], K[1, 1], K[0, 2], K[1, 2]))
    state = np.zeros((1, H, W, 1), np.float32)
    state[0, :, 10, 0] = 7.0  # a vertical stripe at x=10
    weights = np.ones((1, H, W, 1), np.float32)
    # previous-frame points must reflect the previous camera: same depth
    ws, _, _ = compute_flow(
        jnp.asarray(state), jnp.asarray(weights), jnp.asarray(pts[None]),
        jnp.asarray(depth), jnp.asarray(meta), kernel_size=0,
    )
    # stripe should now appear at x=9 (reads from x+1)
    assert np.asarray(ws)[0, 5, 9, 0] == pytest.approx(7.0, abs=1e-4)


def test_voxel_backproject_project_roundtrip():
    from posecnn_tpu.ops.voxel import backproject, compute_label, project

    g = 8
    meta = identity_meta()
    # voxel grid covering [-0.4, 0.4]³ around z=1 (X=depth axis per ref
    # layout: X from meta[42]*d + meta[45])
    meta[0, 42:45] = 0.1
    meta[0, 45] = -0.4
    meta[0, 46] = -0.4
    meta[0, 47] = 0.6  # Z (w axis) from 0.6 to 1.4
    depth = np.full((1, H, W), 1.0, np.float32)
    feats = np.random.RandomState(0).rand(1, H, W, 4).astype(np.float32)
    labels = np.zeros((1, H, W, C), np.float32)
    labels[..., 2] = 1.0
    labels_3d = np.zeros((1, g, g, g, C), np.float32)

    vox_data, vox_label, vox_flag = backproject(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(labels_3d),
        jnp.asarray(depth), jnp.asarray(meta), grid_size=g, threshold=0.06,
    )
    assert float(vox_flag.sum()) > 0  # some voxels on the depth surface
    # filled voxels carry class-2 probability 1
    filled = np.asarray(vox_flag)[0, ..., 0] > 0
    np.testing.assert_allclose(np.asarray(vox_label)[0][filled][:, 2], 1.0, atol=1e-5)

    lab2d = compute_label(vox_label, jnp.asarray(depth), jnp.asarray(meta))
    # pixels mapping into filled voxels get class 2
    proj = project(vox_flag, jnp.asarray(depth), jnp.asarray(meta))
    hit = np.asarray(proj)[0, ..., 0] > 0
    assert hit.sum() > 0
    assert np.all(np.asarray(lab2d)[0][hit] == 2)


def test_triplet_loss_separated_embeddings(rng):
    from posecnn_tpu.ops.embedding_losses import triplet_loss

    n = 128
    labels = np.repeat([0, 1], n // 2)
    emb_good = np.concatenate(
        [np.tile([5.0, 0.0], (n // 2, 1)), np.tile([-5.0, 0.0], (n // 2, 1))]
    ) + rng.randn(n, 2) * 0.01
    emb_bad = rng.randn(n, 2)
    l_good = float(
        triplet_loss(jnp.asarray(emb_good, jnp.float32), jnp.asarray(labels), jax.random.PRNGKey(0))
    )
    l_bad = float(
        triplet_loss(jnp.asarray(emb_bad, jnp.float32), jnp.asarray(labels), jax.random.PRNGKey(0))
    )
    assert l_good < 1e-3
    assert l_bad > l_good


def test_lifted_structured_loss_orders(rng):
    from posecnn_tpu.ops.embedding_losses import lifted_structured_loss

    n = 64
    labels = np.repeat([0, 1], n // 2)
    emb_good = np.concatenate(
        [np.tile([4.0, 0.0], (n // 2, 1)), np.tile([-4.0, 0.0], (n // 2, 1))]
    ).astype(np.float32)
    emb_bad = rng.randn(n, 2).astype(np.float32)
    l_good = float(lifted_structured_loss(jnp.asarray(emb_good), jnp.asarray(labels)))
    l_bad = float(lifted_structured_loss(jnp.asarray(emb_bad), jnp.asarray(labels)))
    assert l_good < l_bad


def test_recurrent_video_net_runs(rng):
    from posecnn_tpu.models.recurrent import RecurrentSegNet

    t, b = 3, 1
    model = RecurrentSegNet(num_classes=C, num_units=8)
    frames = jnp.asarray(rng.randn(t, b, H, W, 3).astype(np.float32))
    depths = jnp.ones((t, b, H, W), jnp.float32)
    metas = jnp.asarray(np.tile(identity_meta()[None], (t, 1, 1)))
    params = model.init(jax.random.PRNGKey(0), frames, depths, metas)
    log_probs, labels, final = model.apply(params, frames, depths, metas)
    assert log_probs.shape == (t, b, H, W, C)
    assert labels.shape == (t, b, H, W)
    assert np.all(np.isfinite(np.asarray(log_probs)))
    # weights accumulate over time
    assert float(final.weights.mean()) > 0


def test_resnet50_seg_runs(rng):
    from posecnn_tpu.models.resnet50 import ResNet50Seg

    model = ResNet50Seg(num_classes=C, num_units=8, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    log_prob, label = model.apply(params, x)
    assert log_prob.shape == (1, H, W, C)
    assert label.shape == (1, H, W)
    assert np.all(np.isfinite(np.asarray(log_prob)))


def test_fcn8_runs(rng):
    from posecnn_tpu.models.fcn8 import FCN8

    model = FCN8(num_classes=C, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    log_prob, label = model.apply(params, x)
    assert log_prob.shape == (1, H, W, C)
    assert np.all(np.isfinite(np.asarray(log_prob)))
