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
