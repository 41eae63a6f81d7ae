"""Real-frame video-sequence feeder (ref: GtDataLayer
lib/gt_data_layer/minibatch.py:20-310): NUM_STEPS frame stacking,
relative camera poses in meta[18:42], first-frame voxel grid in
meta[42:48], video-boundary clamping."""

import numpy as np

from posecnn_tpu.data.minibatch import get_real_video_minibatch

H, W = 48, 64
K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)


def _rt(angle, tx):
    """Camera world→cam RT: rotation about Y + translation x."""
    c, s = np.cos(angle), np.sin(angle)
    rt = np.zeros((3, 4), np.float64)
    rt[:, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    rt[:, 3] = [tx, 0, 0]
    return rt


class FakeVideoDataset:
    """Two videos with per-frame camera motion along x."""

    image_index = ["0001/000001", "0001/000002", "0001/000003", "0002/000001"]

    def load_frame(self, index):
        video, frame = index.split("/")
        t = int(frame) - 1
        rng = np.random.RandomState(t + 100 * int(video))
        color = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        label = np.zeros((H, W), np.int32)
        label[10 : 20 + t, 20:40] = 3
        depth_raw = np.full((H, W), 900 + 10 * t, np.uint16)
        return {
            "color": color,
            "label": label,
            "depth_raw": depth_raw,
            "intrinsic_matrix": K,
            "meta": {
                "factor_depth": 1000.0,
                "rotation_translation_matrix": _rt(0.05 * t, 0.02 * t),
            },
        }


def test_video_minibatch_shapes_and_meta():
    ds = FakeVideoDataset()
    T, B = 3, 2
    b = get_real_video_minibatch(
        ds, [0, 0], num_steps=T, height=H, width=W,
        pixel_means=np.zeros(3, np.float32),
    )
    assert b["image"].shape == (T, B, H, W, 3)
    assert b["depth"].shape == (T, B, H, W)
    assert b["meta"].shape == (T, B, 48)
    assert b["label"].shape == (T, B, H, W)
    assert b["label"].dtype == np.int32
    # depth is metric (factor_depth applied)
    np.testing.assert_allclose(b["depth"][0, 0], 0.9, atol=1e-6)
    # frame 0: world frame == first camera → identity world2live
    m0 = b["meta"][0, 0]
    np.testing.assert_allclose(m0[18:30].reshape(3, 4)[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m0[18:30].reshape(3, 4)[:, 3], 0, atol=1e-6)
    # frame 2: w2l = RT_2 · RT_0⁻¹ (RT_0 = identity here) = RT_2
    m2 = b["meta"][2, 0]
    np.testing.assert_allclose(
        m2[18:30].reshape(3, 4), _rt(0.1, 0.04), atol=1e-5
    )
    # live2world is the inverse: w2l ∘ l2w = identity
    w2l = m2[18:30].reshape(3, 4)
    l2w = m2[30:42].reshape(3, 4)
    comp_r = w2l[:, :3] @ l2w[:, :3]
    comp_t = w2l[:, :3] @ l2w[:, 3] + w2l[:, 3]
    np.testing.assert_allclose(comp_r, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(comp_t, 0, atol=1e-6)
    # voxel fields populated from frame-0 depth and CONSTANT over the
    # sequence (the grid is fixed per sequence, ref minibatch.py:208)
    assert (m0[42:45] > 0).all()
    np.testing.assert_allclose(b["meta"][1, 0, 42:48], m0[42:48])
    np.testing.assert_allclose(b["meta"][2, 0, 42:48], m0[42:48])
    # intrinsics round-trip
    np.testing.assert_allclose(m0[:9].reshape(3, 3), K, atol=1e-6)


def test_video_minibatch_respects_video_boundary():
    ds = FakeVideoDataset()
    # start at the last frame of video 0001: frames 2,3 would cross
    # into video 0002 → the last in-video frame is repeated
    b = get_real_video_minibatch(
        ds, [2], num_steps=3, height=H, width=W,
        pixel_means=np.zeros(3, np.float32),
    )
    np.testing.assert_allclose(b["image"][1, 0], b["image"][0, 0])
    np.testing.assert_allclose(b["image"][2, 0], b["image"][0, 0])
    np.testing.assert_allclose(b["meta"][2, 0], b["meta"][0, 0])


def test_video_minibatch_feeds_recurrent_model():
    """The feeder's blobs drive RecurrentSegNet end-to-end (the
    reference's GtDataLayer → vgg16 video graph path, vgg16.py:41-166)."""
    import jax
    import jax.numpy as jnp

    from posecnn_tpu.models.recurrent import RecurrentSegNet

    ds = FakeVideoDataset()
    b = get_real_video_minibatch(
        ds, [0], num_steps=2, height=H, width=W,
        pixel_means=np.zeros(3, np.float32),
    )
    model = RecurrentSegNet(num_classes=4, num_units=8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["image"]), jnp.asarray(b["depth"]), jnp.asarray(b["meta"]),
    )
    out = model.apply(
        params, jnp.asarray(b["image"]), jnp.asarray(b["depth"]), jnp.asarray(b["meta"])
    )
    logits = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(logits)[0])).all()
