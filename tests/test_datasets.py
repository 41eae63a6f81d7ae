"""Dataset readers against the real (read-only) reference data tree —
model point clouds, extents, class metadata, demo frames."""

import os

import numpy as np
import pytest

from posecnn_tpu.core.registry import DATASETS
from posecnn_tpu.data.datasets import DemoDataset, YCBVideoDataset

LOV_ROOT = "/root/reference/data/LOV"
DEMO_ROOT = "/root/reference/data/demo_images"

needs_lov = pytest.mark.skipif(
    not os.path.exists(os.path.join(LOV_ROOT, "models")), reason="LOV models absent"
)
needs_demo = pytest.mark.skipif(
    not os.path.exists(DEMO_ROOT), reason="demo images absent"
)


@needs_lov
def test_ycb_video_metadata():
    ds = YCBVideoDataset(LOV_ROOT, "debug", num_points=512)
    assert ds.num_classes == 22
    assert ds.points.shape == (22, 512, 3)
    # real model clouds loaded, nonzero, centered near origin
    for c in (1, 5, 21):
        p = ds.points[c]
        assert np.abs(p).max() > 0.01
        assert np.abs(p.mean(0)).max() < 0.2
    assert ds.extents.shape == (22, 3)
    assert ds.extents[1:].min() > 0
    # extents roughly bound the point clouds
    spread = ds.points.max(1) - ds.points.min(1)
    assert np.all(spread[1:] <= ds.extents[1:] + 0.02)
    assert len(ds.image_index) > 0  # debug.txt
    assert ds.symmetry.shape == (22,)
    assert ds.symmetry.sum() == 2  # wood_block + foam_brick


@needs_lov
def test_ycb_subsampled_points():
    ds = YCBVideoDataset(LOV_ROOT, "debug", num_points=256)
    sub = ds.subsampled_points(64)
    assert sub.shape == (22, 64, 3)


@needs_demo
def test_demo_dataset_frames():
    ds = DemoDataset(DEMO_ROOT)
    assert len(ds.image_index) == 5
    frame = ds.load_frame(ds.image_index[0])
    assert frame["color"].ndim == 3 and frame["color"].shape[2] >= 3
    assert frame["color"].shape[:2] == (480, 640)
    if "depth" in frame:
        assert frame["depth"].shape == (480, 640)
        assert 0.1 < np.median(frame["depth"][frame["depth"] > 0]) < 5.0


def test_registry_has_datasets():
    for name in ("ycb_video", "lov", "linemod", "demo"):
        assert name in DATASETS


def test_pad_image_blob():
    import numpy as np

    from posecnn_tpu.data.minibatch import pad_image_blob

    ims = [np.ones((30, 41, 3)), np.ones((25, 33, 3))]
    blob = pad_image_blob(ims, np.zeros(3))
    # padded to x16 of the max size
    assert blob.shape == (2, 32, 48, 3)
    assert blob[0, :30, :41].sum() == 30 * 41 * 3
    assert blob[1, 25:].sum() == 0


def test_pose_bank_loading_and_sampling(tmp_path):
    """SYN_SAMPLE_POSE: bank rows [quat, t] are loaded from
    <root>/poses/<cls>.txt and drive the synthetic pose sampler with
    the reference's ±0.2/±0.1 jitter (ref synthesize.cpp:412-422)."""
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator

    root = tmp_path / "ds"
    (root / "poses").mkdir(parents=True)
    classes = ("__background__", "a", "b", "c")
    # bank only for class 2: a single pose far from the uniform range
    bank_row = np.array([1.0, 0, 0, 0, 0.3, -0.2, 1.5], np.float32)
    np.savetxt(root / "poses" / "b.txt", bank_row[None].repeat(3, 0))

    from posecnn_tpu.data.datasets import PoseDataset

    ds = PoseDataset(str(root), "train", classes, np.zeros(4), num_points=16)
    bank = ds.load_pose_bank()
    assert bank[0] is None and bank[1] is None and bank[3] is None
    assert bank[2].shape == (3, 7)

    rng = np.random.RandomState(0)
    points = (rng.rand(4, 128, 3).astype(np.float32) - 0.5) * 0.1
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=320, height=240,
        min_objects=1, max_objects=1, seed=1,
        class_whitelist=[2], sample_pose=True, pose_bank=bank,
    )
    for _ in range(5):
        s = gen.render()
        assert s.poses.shape[0] == 1
        t = s.poses[0, 10:13]
        # jitter is ±0.1 per axis around the bank translation
        assert np.all(np.abs(t - bank_row[4:7]) <= 0.1 + 1e-6)
        q = s.poses[0, 6:10]
        # quaternion near identity modulo jitter: |w| dominates
        assert abs(q[0]) > 0.6

    # classes without a bank row fall back to the uniform sampler
    gen2 = SyntheticSceneGenerator(
        points, extents, k, width=320, height=240,
        min_objects=1, max_objects=1, seed=2,
        class_whitelist=[1], sample_pose=True, pose_bank=bank,
    )
    s2 = gen2.render()
    assert 0.5 <= s2.poses[0, 12] <= 2.0


def test_min_separation_between_objects():
    rng = np.random.RandomState(0)
    points = (rng.rand(5, 128, 3).astype(np.float32) - 0.5) * 0.1
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator_ = __import__(
        "posecnn_tpu.data.synthetic", fromlist=["SyntheticSceneGenerator"]
    ).SyntheticSceneGenerator(
        points, extents, k, width=320, height=240,
        min_objects=4, max_objects=4, seed=3, min_separation=0.3,
    )
    for _ in range(3):
        s = gen.render()
        t = s.poses[:, 10:13]
        for i in range(len(t)):
            for j in range(i + 1, len(t)):
                assert np.linalg.norm(t[i] - t[j]) >= 0.3 - 1e-6
