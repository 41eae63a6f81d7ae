"""COCO export: contour tracing, polygon simplification, RLE,
writer schema, and the CLI end-to-end on synthetic scenes
(ref semantics: my_tools/ycb_to_coco.py, my_tools/coco_annotation.py)."""

import json
import os

import numpy as np
import pytest

from posecnn_tpu.data.coco_export import (
    CocoWriter,
    frame_annotations,
    largest_components,
    mask_to_polygons,
    mask_to_rle,
    polygon_area,
    rle_to_mask,
    simplify_polygon,
    trace_boundary,
)


def _point_in_poly(pt, poly):
    # ray casting
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        if (y0 > y) != (y1 > y):
            xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if x < xint:
                inside = not inside
    return inside


def test_trace_boundary_rectangle():
    mask = np.zeros((20, 30), bool)
    mask[5:15, 8:25] = True
    b = trace_boundary(mask)
    # every traced point is a mask boundary pixel
    assert np.all(mask[b[:, 1], b[:, 0]])
    # covers the full bbox of the mask
    assert b[:, 0].min() == 8 and b[:, 0].max() == 24
    assert b[:, 1].min() == 5 and b[:, 1].max() == 14
    # simplification of a rectangle boundary keeps ~corners only
    closed = np.vstack([b, b[:1]])
    perim = float(np.sum(np.hypot(*np.diff(closed, axis=0).T)))
    simp = simplify_polygon(b, 0.01 * perim)
    assert 4 <= len(simp) <= 8
    area = polygon_area(simp)
    assert abs(area - (16 * 9)) / (16 * 9) < 0.15  # boundary-pixel polygon


def test_trace_boundary_degenerate():
    mask = np.zeros((5, 5), bool)
    assert trace_boundary(mask).shape == (0, 2)
    mask[2, 3] = True
    b = trace_boundary(mask)
    assert b.shape == (1, 2) and tuple(b[0]) == (3, 2)
    # single-row line
    mask[:] = False
    mask[2, 1:4] = True
    b = trace_boundary(mask)
    assert np.all(mask[b[:, 1], b[:, 0]])


def test_mask_to_polygons_components():
    mask = np.zeros((40, 40), bool)
    mask[2:10, 2:10] = True  # 64 px
    mask[20:38, 20:38] = True  # 324 px (largest)
    comps = largest_components(mask, max_components=2)
    assert len(comps) == 2
    assert comps[0].sum() == 18 * 18 and comps[1].sum() == 8 * 8
    polys = mask_to_polygons(mask, max_components=2)
    assert len(polys) == 2
    # largest-first ordering (ref ycb_to_coco.py:17-18)
    assert polygon_area(polys[0]) > polygon_area(polys[1])
    # interior point containment
    assert _point_in_poly((29, 29), polys[0])
    assert _point_in_poly((5, 5), polys[1])


def test_rle_roundtrip(rng):
    mask = rng.rand(37, 23) > 0.6
    rle = mask_to_rle(mask)
    assert rle["size"] == [37, 23]
    assert sum(rle["counts"]) == 37 * 23
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    # all-zero and all-one masks
    for m in (np.zeros((4, 6), bool), np.ones((4, 6), bool)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_writer_schema():
    w = CocoWriter(["a", "b"], supercategory="S")
    assert [c["id"] for c in w.data["categories"]] == [1, 2]  # 1-indexed
    w.add_image(1, 64, 48, "x-color.png", "x-depth.png", factor_depth=10000.0)
    poly = np.array([[1, 1], [10, 1], [10, 8], [1, 8]])
    w.add_annotation(1, 1, 2, polygons=[poly], meta={"center": [5.0, 4.0]})
    d = w.get_annot_json()
    ann = d["annotations"][0]
    assert ann["bbox"] == [1.0, 1.0, 9.0, 7.0]
    assert ann["category_id"] == 2
    assert ann["area"] == pytest.approx(63.0)
    assert ann["segmentation"] == [poly.flatten().tolist()]
    assert ann["meta"]["center"] == [5.0, 4.0]
    assert d["images"][0]["meta"]["depth_file"] == "x-depth.png"
    json.dumps(d)  # serializable


def test_frame_annotations_meta():
    label = np.zeros((24, 32), np.int32)
    label[4:12, 6:16] = 1
    label[14:20, 20:30] = 3
    gt = np.zeros((2, 13), np.float32)
    gt[0, 1], gt[1, 1] = 1, 3
    gt[:, 2:4] = [[10.0, 8.0], [25.0, 17.0]]
    gt[:, 6] = 1.0  # identity quats
    gt[:, 12] = 1.0
    k = np.eye(3, dtype=np.float32) * 100.0
    w = CocoWriter([f"c{i}" for i in range(1, 6)])
    nxt = frame_annotations(w, 7, 1, label, gt, k, segmentation="rle")
    assert nxt == 3
    anns = w.data["annotations"]
    assert [a["category_id"] for a in anns] == [1, 3]
    assert all(a["image_id"] == 7 for a in anns)
    m = rle_to_mask(anns[0]["segmentation"])
    np.testing.assert_array_equal(m, label == 1)
    assert anns[1]["meta"]["pose"][:4] == [1.0, 0.0, 0.0, 0.0]
    assert anns[1]["meta"]["intrinsic_matrix"][0][0] == 100.0


def test_export_coco_cli_synthetic(tmp_path):
    from posecnn_tpu.cli.export_coco import main

    out = str(tmp_path / "coco")
    data = main(
        [
            "--dataset", "synthetic",
            "--data_root", str(tmp_path / "nonexistent"),
            "--output", out,
            "--num_images", "3",
            "--set", "train.num_classes=5", "train.syn_width=96",
            "train.syn_height=64", "train.syn_tnear=0.6", "train.syn_tfar=1.2",
        ]
    )
    assert os.path.exists(os.path.join(out, "annotations.json"))
    assert len(data["images"]) == 3
    assert len(data["categories"]) == 4
    assert len(data["annotations"]) >= 3
    for ann in data["annotations"]:
        img = data["images"][ann["image_id"] - 1]
        x, y, bw, bh = ann["bbox"]
        assert 0 <= x <= x + bw <= img["width"]
        assert 0 <= y <= y + bh <= img["height"]
        assert 1 <= ann["category_id"] <= 4
        assert len(ann["meta"]["pose"]) == 7
        # saved PNGs exist
        assert os.path.exists(os.path.join(out, "images", img["file_name"]))
        assert os.path.exists(os.path.join(out, "images", img["meta"]["depth_file"]))
