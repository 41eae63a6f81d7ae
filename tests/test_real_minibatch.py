"""Real-frame minibatch assembly: input modes, flip augmentation,
GT pose blobs (ref: lib/gt_synthesize_layer/minibatch.py real branch;
flipped roidb per lib/datasets/imdb.py:104-117)."""

import numpy as np
import pytest

from posecnn_tpu.data.minibatch import (
    build_image_blobs,
    flip_poses,
    get_real_minibatch,
    mat_to_quat_np,
    normals_from_depth_np,
)

H, W, C = 64, 80, 4
K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64) / np.linalg.norm(axis)
    a = np.cos(angle / 2)
    b, c, d = axis * np.sin(angle / 2)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a - b * b + c * c - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a - b * b - c * c + d * d],
        ]
    )


class FakeDataset:
    """Duck-typed PoseDataset: one object of class 2 centered at a
    known pixel."""

    image_index = ["000001", "000002", "000003"]

    def frame_prefix(self, index):
        return "/nonexistent/" + index

    def load_frame(self, index):
        rng = np.random.RandomState(int(index))
        color = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        label = np.zeros((H, W), np.int32)
        label[20:40, 30:50] = 2
        t = np.array([0.02, -0.01, 0.8], np.float32)
        pose = np.zeros((3, 4, 1), np.float32)
        pose[:, :3, 0] = _rot([0, 1, 0], 0.3)
        pose[:, 3, 0] = t
        proj = K @ t
        center = (proj[:2] / proj[2])[None]
        depth_raw = np.full((H, W), 800, np.uint16)
        return {
            "color": color,
            "label": label,
            "depth_raw": depth_raw,
            "poses": pose,
            "cls_indexes": np.array([2]),
            "center": center.astype(np.float32),
            "intrinsic_matrix": K,
            "meta": {"factor_depth": 1000.0},
        }


def test_mat_to_quat_roundtrip():
    for axis, ang in [((1, 0, 0), 0.4), ((0, 1, 1), 2.5), ((1, -2, 3), -1.1), ((0, 0, 1), 3.1)]:
        r = _rot(axis, ang)
        q = mat_to_quat_np(r)
        assert abs(np.linalg.norm(q) - 1) < 1e-6
        w, x, y, z = q
        r2 = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(r2, r, atol=1e-6)


def test_flip_poses_mirrors_projection():
    """Projected center of a flipped pose is the mirror of the original
    center (the invariant behind minibatch.py:502-513 + :394-396)."""
    t = np.array([0.05, 0.02, 0.9])
    pose = np.zeros((1, 3, 4), np.float32)
    pose[0, :, :3] = _rot([1, 1, 0], 0.7)
    pose[0, :, 3] = t
    flipped = flip_poses(pose, K, W)
    p0 = K @ t
    c0 = p0[:2] / p0[2]
    p1 = K.astype(np.float64) @ flipped[0, :, 3]
    c1 = p1[:2] / p1[2]
    assert abs((W - c0[0]) - c1[0]) < 1e-3
    assert abs(c0[1] - c1[1]) < 1e-3
    # rotation stays orthonormal
    r = flipped[0, :, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_normals_flat_plane_faces_camera():
    depth = np.full((H, W), 1.5, np.float32)
    n = normals_from_depth_np(depth, K)
    inner = n[2:-2, 2:-2]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-5)
    assert np.abs(inner[..., :2]).max() < 1e-5
    # invalid depth → zero normal
    depth[5, 5] = 0
    n = normals_from_depth_np(depth, K)
    assert np.all(n[5, 5] == 0)


@pytest.mark.parametrize("mode", ["COLOR", "DEPTH", "RGBD", "NORMAL"])
def test_build_image_blobs_modes(mode):
    rng = np.random.RandomState(0)
    color = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    depth = np.full((H, W), 900, np.float32)
    pm = np.array([102.9801, 115.9465, 122.7717], np.float32)
    data, data_p = build_image_blobs(
        color, depth, K, input_mode=mode, pixel_means=pm, rng=rng,
        chromatic=(mode == "COLOR"), noise=(mode in ("COLOR", "NORMAL")),
    )
    assert data.shape == (H, W, 3)
    if mode == "RGBD":
        assert data_p is not None and data_p.shape == (H, W, 3)
        # depth tower: constant depth → constant blob rows
        assert np.allclose(data_p, data_p[0, 0], atol=1e-4)
    else:
        assert data_p is None
    if mode == "DEPTH":
        # max-normalized to 255 before mean subtraction
        assert np.allclose(data + pm, 255.0, atol=1e-4)


def test_get_real_minibatch_color_blobs():
    ds = FakeDataset()
    batch = get_real_minibatch(
        ds, [0, 1], num_classes=C, height=H, width=W,
        pixel_means=(102.9801, 115.9465, 122.7717), input_mode="COLOR",
        rng=np.random.RandomState(0), max_gt=8,
    )
    assert batch["data"].shape == (2, H, W, 3)
    assert batch["label"].shape == (2, H, W)
    assert batch["vertex_targets"].shape == (2, H, W, 3 * C)
    assert batch["meta"].shape == (2, 48)
    assert batch["gt_valid"][:2].all() and not batch["gt_valid"][2:].any()
    assert batch["gt_poses"][0, 0] == 0 and batch["gt_poses"][1, 0] == 1
    assert batch["gt_poses"][0, 1] == 2  # class id
    assert abs(np.linalg.norm(batch["gt_poses"][0, 6:10]) - 1) < 1e-5
    # vertex target at a labeled pixel points toward the center
    frame = ds.load_frame("000001")
    cx, cy = frame["center"][0]
    y, x = 25, 35
    vt = batch["vertex_targets"][0, y, x, 6:9]
    d = np.array([cx - x, cy - y])
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(vt[:2], d, atol=1e-4)
    np.testing.assert_allclose(vt[2], np.log(0.8), atol=1e-4)
    assert batch["vertex_weights"][0, y, x, 6] == 10.0
    assert batch["depth"][0, y, x] == pytest.approx(0.8)


def test_get_real_minibatch_flipped():
    ds = FakeDataset()
    n = len(ds.image_index)
    plain = get_real_minibatch(
        ds, [0], num_classes=C, height=H, width=W,
        pixel_means=(0.0, 0.0, 0.0), use_flipped=True, max_gt=4,
    )
    flipped = get_real_minibatch(
        ds, [0 + n], num_classes=C, height=H, width=W,
        pixel_means=(0.0, 0.0, 0.0), use_flipped=True, max_gt=4,
    )
    np.testing.assert_array_equal(flipped["label"][0], plain["label"][0, :, ::-1])
    np.testing.assert_allclose(flipped["data"][0], plain["data"][0, :, ::-1], atol=1e-5)
    # mirrored GT center
    cx = plain["gt_poses"][0, 2]
    assert abs((W - cx) - flipped["gt_poses"][0, 2]) < 1e-3
    # flipped translation projects onto the mirrored center
    t = flipped["gt_poses"][0, 10:13]
    proj = K.astype(np.float64) @ t
    assert abs(proj[0] / proj[2] - flipped["gt_poses"][0, 2]) < 1e-2
    # vertex targets: flipped pixel points at mirrored center
    ys, xs = np.nonzero(flipped["label"][0] == 2)
    y, x = ys[len(ys) // 2], xs[len(xs) // 2]
    vt = flipped["vertex_targets"][0, y, x, 6:8]
    d = np.array([flipped["gt_poses"][0, 2] - x, flipped["gt_poses"][0, 3] - y])
    np.testing.assert_allclose(vt, d / np.linalg.norm(d), atol=1e-4)


def test_get_real_minibatch_rgbd():
    ds = FakeDataset()
    batch = get_real_minibatch(
        ds, [0, 1], num_classes=C, height=H, width=W,
        pixel_means=(102.9801, 115.9465, 122.7717), input_mode="RGBD", max_gt=8,
    )
    assert "data_p" in batch and batch["data_p"].shape == (2, H, W, 3)


class FakeDatasetNoCenter(FakeDataset):
    """Same frames but the meta carries no 'center' — exercises the
    projected-translation fallback (LINEMOD-style metas)."""

    def load_frame(self, index):
        frame = super().load_frame(index)
        del frame["center"]
        return frame


def test_flipped_fallback_center_not_double_mirrored():
    """When centers come from projecting the (already flip-reflected)
    poses, they must NOT be mirrored a second time: regression for the
    double-flip bug."""
    ds = FakeDatasetNoCenter()
    n = len(ds.image_index)
    flipped = get_real_minibatch(
        ds, [0 + n], num_classes=C, height=H, width=W,
        pixel_means=(0.0, 0.0, 0.0), use_flipped=True, max_gt=4,
    )
    # the GT center stored in the pose blob must equal the projection
    # of the flipped translation
    t = flipped["gt_poses"][0, 10:13]
    proj = K.astype(np.float64) @ t
    cx_expect = proj[0] / proj[2]
    assert abs(flipped["gt_poses"][0, 2] - cx_expect) < 1e-3
    # and vertex targets at a labeled pixel point toward THAT center
    ys, xs = np.nonzero(flipped["label"][0] == 2)
    y, x = ys[len(ys) // 2], xs[len(xs) // 2]
    vt = flipped["vertex_targets"][0, y, x, 6:8]
    d = np.array([cx_expect - x, proj[1] / proj[2] - y])
    np.testing.assert_allclose(vt, d / np.linalg.norm(d), atol=1e-4)


def test_get_real_minibatch_scaled():
    """TRAIN.SCALES_BASE rescale (ref: minibatch.py:155-175): image,
    label, centers and intrinsics scale together; depth values and
    translations stay metric."""
    s = 1.5
    hs, ws = int(H * s), int(W * s)
    batch = get_real_minibatch(
        FakeDataset(), [0], num_classes=C, height=hs, width=ws,
        pixel_means=(102.0, 115.0, 122.0), scale=s,
    )
    assert batch["data"].shape == (1, hs, ws, 3)
    lab = batch["label"][0]
    ys, xs = np.nonzero(lab == 2)
    # the 20:40 × 30:50 object block scales to ~30:60 × 45:75
    assert abs(ys.min() - 30) <= 1 and abs(ys.max() - 59) <= 1
    assert abs(xs.min() - 45) <= 1 and abs(xs.max() - 74) <= 1
    # meta carries the scaled intrinsics
    k_meta = batch["meta"][0, :9].reshape(3, 3)
    np.testing.assert_allclose(k_meta[0, 0], K[0, 0] * s, rtol=1e-6)
    np.testing.assert_allclose(k_meta[1, 2], K[1, 2] * s, rtol=1e-6)
    # GT center (columns 2:4) scales; translation (10:13) stays metric
    t = np.array([0.02, -0.01, 0.8])
    proj = (K @ t) * s
    np.testing.assert_allclose(batch["gt_poses"][0, 2:4], proj[:2] / t[2] , rtol=1e-5)
    np.testing.assert_allclose(batch["gt_poses"][0, 10:13], t, rtol=1e-5)
    # depth stays metric (0.8 m everywhere the sensor saw 800/1000)
    np.testing.assert_allclose(batch["depth"][0, 0, 0], 0.8, rtol=1e-6)
    # vertex targets on object pixels point at the SCALED center
    cx, cy = proj[0] / t[2], proj[1] / t[2]
    yy, xx = ys[0], xs[0]
    u = batch["vertex_targets"][0, yy, xx, 3 * 2]
    v = batch["vertex_targets"][0, yy, xx, 3 * 2 + 1]
    dxy = np.array([cx - xx, cy - yy])
    dxy = dxy / np.linalg.norm(dxy)
    np.testing.assert_allclose([u, v], dxy, atol=1e-4)


def test_get_real_minibatch_sparse_vertex_matches_dense():
    """Sparse per-class vertex feed from real frames: the on-device
    builder reproduces the dense host maps exactly."""
    import jax.numpy as jnp

    from posecnn_tpu.ops.losses import build_vertex_targets

    ds = FakeDataset()
    kw = dict(
        num_classes=C, height=H, width=W,
        pixel_means=(102.9801, 115.9465, 122.7717), input_mode="COLOR",
        rng=np.random.RandomState(0), max_gt=8,
    )
    dense = get_real_minibatch(ds, [0, 1], **kw)
    sparse = get_real_minibatch(ds, [0, 1], dense_vertex_targets=False, **kw)
    assert "vertex_targets" not in sparse
    assert sparse["vertex_centers"].shape == (2, C, 2)
    t_dev, w_dev = build_vertex_targets(
        jnp.asarray(sparse["label"]),
        jnp.asarray(sparse["vertex_centers"]),
        jnp.asarray(sparse["vertex_logz"]),
        jnp.asarray(sparse["vertex_valid"]),
    )
    np.testing.assert_allclose(
        np.asarray(t_dev), dense["vertex_targets"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(w_dev), dense["vertex_weights"], atol=1e-5
    )
