"""Evaluator tests: IoU histogram math and pose-metric aggregation."""

import numpy as np
import pytest

from posecnn_tpu.engine.evaluate import (
    PoseEvaluator,
    extract_detections,
    fast_hist,
    iou_from_hist,
)


def test_fast_hist_and_iou():
    gt = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([0, 1, 1, 1, 2, 0])
    hist = fast_hist(gt, pred, 3)
    assert hist.sum() == 6
    iou = iou_from_hist(hist)
    # class1: inter 2, union gt(2)+pred(3)-2 = 3
    np.testing.assert_allclose(iou[1], 2 / 3, atol=1e-6)


def test_pose_evaluator_perfect_predictions(rng):
    c = 3
    pts = (rng.rand(c, 40, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    ev = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0.1, 0.0, 1.0], np.float32)
    for _ in range(4):
        ev.add_image([(1, q, t)], [(1, q, t)])
    s = ev.summarize()
    assert s["per_class"][1]["success_rate"] == 1.0
    assert s["add_auc"] > 0.95


def test_pose_evaluator_instance_matching(rng):
    """Two same-class instances: the default evaluator collapses to
    one detection per class (second GT scores inf); with
    instance_matching=True both det/GT pairs match greedily by
    translation and both score perfectly."""
    c = 3
    pts = (rng.rand(c, 40, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    q = np.array([1.0, 0, 0, 0], np.float32)
    t_a = np.array([-0.2, 0.0, 1.0], np.float32)
    t_b = np.array([0.25, 0.0, 1.1], np.float32)
    dets = [(1, q, t_a), (1, q, t_b)]
    gts = [(1, q, t_b), (1, q, t_a)]  # deliberately cross-ordered

    ev_ref = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    ev_ref.add_image(dets, gts)
    s_ref = ev_ref.summarize()
    assert s_ref["per_class"][1]["count"] == 2
    # first-of-class matching: det t_a vs both GTs → one pair is 0.45m off
    assert s_ref["per_class"][1]["success_rate"] == 0.5

    ev_im = PoseEvaluator(num_classes=c, points=pts, extents=ext,
                          instance_matching=True)
    ev_im.add_image(dets, gts)
    s_im = ev_im.summarize()
    assert s_im["per_class"][1]["count"] == 2
    assert s_im["per_class"][1]["success_rate"] == 1.0

    # more GTs than dets: the surplus GT records a miss (inf)
    ev2 = PoseEvaluator(num_classes=c, points=pts, extents=ext,
                        instance_matching=True)
    ev2.add_image([(1, q, t_a)], gts)
    s2 = ev2.summarize()
    assert s2["per_class"][1]["count"] == 2
    assert s2["per_class"][1]["success_rate"] == 0.5


def test_pose_evaluator_missed_detection(rng):
    c = 3
    pts = (rng.rand(c, 40, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    ev = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0.0, 0.0, 1.0], np.float32)
    ev.add_image([], [(2, q, t)])  # miss
    ev.add_image([(2, q, t)], [(2, q, t)])  # hit
    s = ev.summarize()
    assert s["per_class"][2]["success_rate"] == 0.5


def test_pose_evaluator_symmetric_class_uses_adi(rng):
    c = 2
    # ring of points: rotation about z is a perfect symmetry
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ring = np.stack([0.05 * np.cos(theta), 0.05 * np.sin(theta), np.zeros(64)], 1)
    pts = np.stack([np.zeros((64, 3)), ring]).astype(np.float32)
    ext = np.abs(pts).max(1) * 2
    ang = 2 * np.pi / 64 * 7  # rotate by exactly 7 ring steps
    q_rot = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
    q_id = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0, 0, 1.0], np.float32)

    ev_sym = PoseEvaluator(num_classes=c, points=pts, extents=ext, symmetric_classes=(1,))
    ev_sym.add_image([(1, q_rot, t)], [(1, q_id, t)])
    assert ev_sym.summarize()["per_class"][1]["success_rate"] == 1.0

    ev_asym = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    ev_asym.add_image([(1, q_rot, t)], [(1, q_id, t)])
    assert ev_asym.summarize()["per_class"][1]["success_rate"] == 0.0


def test_extract_detections():
    rois = np.zeros((3, 7), np.float32)
    rois[0, 1] = 2
    rois[1, 1] = 1
    init = np.zeros((3, 7), np.float32)
    init[:, 0] = 1.0
    init[0, 4:7] = [0.1, 0.2, 1.0]
    quats = np.zeros((3, 12), np.float32)
    quats[0, 8:12] = [0.0, 2.0, 0.0, 0.0]  # unnormalized on purpose
    valid = np.array([True, False, False])
    dets = extract_detections(rois, init, quats, valid, 3)
    assert len(dets) == 1
    cls, q, t = dets[0]
    assert cls == 2
    np.testing.assert_allclose(q, [0, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(t, [0.1, 0.2, 1.0], atol=1e-6)


def test_z_flip_class_recovers(rng):
    """LINEMOD eggbox handling: a prediction equal to the 180°-Z-flipped
    GT must count as success for a z_flip class."""
    c = 2
    pts = (rng.rand(c, 60, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    q_gt = np.array([1.0, 0, 0, 0], np.float32)
    q_flip = np.array([0.0, 0, 0, 1.0], np.float32)  # 180° about z
    t = np.array([0, 0, 1.0], np.float32)

    ev_plain = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    ev_plain.add_image([(1, q_flip, t)], [(1, q_gt, t)])
    ev_flip = PoseEvaluator(num_classes=c, points=pts, extents=ext, z_flip_classes=(1,))
    ev_flip.add_image([(1, q_flip, t)], [(1, q_gt, t)])
    assert ev_plain.summarize()["per_class"][1]["success_rate"] == 0.0
    assert ev_flip.summarize()["per_class"][1]["success_rate"] == 1.0


def test_reproj_metric(rng):
    c = 2
    pts = (rng.rand(c, 60, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0, 0, 1.0], np.float32)
    ev = PoseEvaluator(num_classes=c, points=pts, extents=ext, intrinsics=k)
    ev.add_image([(1, q, t)], [(1, q, t)])  # perfect → reproj 0 px
    t_off = t + np.array([0.05, 0, 0], np.float32)  # 25 px shift at fx=500
    ev.add_image([(1, q, t_off)], [(1, q, t)])
    s = ev.summarize()
    assert s["per_class"][1]["reproj_success_rate"] == 0.5


def test_diameter_threshold(rng):
    c = 2
    pts = (rng.rand(c, 60, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    diam = np.array([0.0, 0.01], np.float32)  # tiny → strict threshold
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0, 0, 1.0], np.float32)
    t_off = t + np.array([0.005, 0, 0], np.float32)  # 5 mm error
    ev = PoseEvaluator(num_classes=c, points=pts, extents=ext, diameters=diam)
    ev.add_image([(1, q, t_off)], [(1, q, t)])
    # 5 mm > 0.1·1 cm → failure under the diameter threshold
    assert ev.summarize()["per_class"][1]["success_rate"] == 0.0


def test_extract_detections_with_indices_pairing():
    """with_indices: each row's roi index points at a roi of the same
    class, and rows are score-descending (regression for the serve.py
    re-zip bug)."""
    rois = np.zeros((3, 7), np.float32)
    rois[0, 1], rois[0, 6] = 2, 0.2
    rois[1, 1], rois[1, 6] = 1, 0.9
    rois[2, 1], rois[2, 6] = 3, 0.5
    init = np.zeros((3, 7), np.float32)
    init[:, 0] = 1.0
    quats = np.zeros((3, 16), np.float32)
    valid = np.array([True, True, True])
    dets = extract_detections(rois, init, quats, valid, 4, with_indices=True)
    assert [i for _, _, _, i in dets] == [1, 2, 0]
    for cls, _, _, i in dets:
        assert int(rois[i, 1]) == cls


def test_detection_ap_perfect_and_miss():
    from posecnn_tpu.engine.evaluate import detection_ap

    gts = [[(1, (10, 10, 50, 50)), (2, (60, 60, 100, 100))], [(1, (20, 20, 40, 40))]]
    # perfect detections
    dets = [
        [(1, 0.9, (10, 10, 50, 50)), (2, 0.8, (60, 60, 100, 100))],
        [(1, 0.95, (20, 20, 40, 40))],
    ]
    res = detection_ap(dets, gts, num_classes=4)
    assert res["map"] == pytest.approx(1.0)
    assert res["per_class"][1] == pytest.approx(1.0)
    # one false positive ranked above a hit lowers AP; a miss lowers recall
    dets_bad = [
        [(1, 0.99, (200, 200, 220, 220)), (1, 0.9, (10, 10, 50, 50))],
        [],
    ]
    res2 = detection_ap(dets_bad, gts, num_classes=4)
    assert 0.0 < res2["per_class"][1] < 1.0
    # duplicate detections of the same GT: second one is a FP
    dets_dup = [
        [(1, 0.9, (10, 10, 50, 50)), (1, 0.85, (11, 11, 50, 50))],
        [(1, 0.95, (20, 20, 40, 40))],
    ]
    res3 = detection_ap(dets_dup, gts, num_classes=4)
    assert res3["per_class"][1] == pytest.approx(1.0)  # dup FP after full recall


def test_summary_sample_sizes_and_table(rng):
    """Every eval artifact carries its sample sizes (r4 verdict task
    3): summarize() records num_images; the reference-style per-class
    table prints count + metrics per class (ref: lov.py:518-660)."""
    from posecnn_tpu.engine.evaluate import format_per_class_table

    c = 3
    pts = (rng.rand(c, 40, 3).astype(np.float32) - 0.5) * 0.1
    ext = np.abs(pts).max(1) * 2
    ev = PoseEvaluator(num_classes=c, points=pts, extents=ext)
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0.1, 0.0, 1.0], np.float32)
    for _ in range(5):
        ev.add_image([(1, q, t)], [(1, q, t), (2, q, t)])
    s = ev.summarize()
    assert s["num_images"] == 5
    assert s["per_class"][1]["count"] == 5
    assert s["per_class"][2]["count"] == 5
    table = format_per_class_table(s, ["bg", "cls_one", "cls_two"])
    assert "cls_one" in table and "cls_two" in table
    # the n column carries the per-class count and the ALL row num_images
    assert any(line.split()[1] == "5" for line in table.splitlines()[2:])
    assert "ALL" in table
