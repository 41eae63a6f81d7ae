"""Pallas Hough vote kernel vs the XLA reference path (interpret mode
on CPU — same code path that compiles on TPU)."""

import jax.numpy as jnp
import numpy as np

from tests.test_hough_voting import EXTENTS, make_scene, run_hough


def test_pallas_backend_matches_xla_end_to_end():
    cls, cx, cy, depth = 2, 100.0, 60.0, 1.2
    label, vert = make_scene([(cls, cx, cy, depth, 30, 25)])
    out_x = run_hough(label, vert, backend="xla")
    out_p = run_hough(label, vert, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(out_x.rois), np.asarray(out_p.rois), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_x.poses_init), np.asarray(out_p.poses_init), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out_x.valid), np.asarray(out_p.valid))


def test_pallas_backend_two_objects():
    label, vert = make_scene(
        [(1, 40.0, 40.0, 0.8, 22, 22), (3, 120.0, 80.0, 1.5, 25, 20)]
    )
    out_x = run_hough(label, vert, backend="xla")
    out_p = run_hough(label, vert, backend="pallas")
    vx = np.asarray(out_x.valid)
    vp = np.asarray(out_p.valid)
    np.testing.assert_array_equal(vx, vp)
    np.testing.assert_allclose(
        np.asarray(out_x.rois)[vx], np.asarray(out_p.rois)[vp], rtol=1e-4, atol=1e-3
    )


def test_pallas_backend_empty_scene():
    label = np.zeros((120, 160), np.int32)
    vert = np.zeros((120, 160, 3 * EXTENTS.shape[0]), np.float32)
    out_p = run_hough(label, vert, backend="pallas")
    assert np.asarray(out_p.valid).sum() == 0


def test_c2f_backend_matches_xla_single():
    cls, cx, cy, depth = 2, 100.0, 60.0, 1.2
    label, vert = make_scene([(cls, cx, cy, depth, 30, 25)])
    out_x = run_hough(label, vert, backend="xla")
    out_c = run_hough(label, vert, backend="pallas_c2f")
    np.testing.assert_array_equal(np.asarray(out_x.valid), np.asarray(out_c.valid))
    np.testing.assert_allclose(
        np.asarray(out_x.rois), np.asarray(out_c.rois), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_x.poses_init), np.asarray(out_c.poses_init), rtol=1e-4, atol=1e-4
    )


def test_c2f_backend_small_and_edge_objects():
    # 4-px object (vote peak only a few cells wide) and an object at the
    # image corner (window-origin clamping) — the regimes where the
    # coarse pass could in principle mislocalize
    label, vert = make_scene(
        [(1, 30.0, 100.0, 2.0, 4, 4), (2, 3.0, 3.0, 1.0, 10, 10)]
    )
    out_x = run_hough(label, vert, backend="xla")
    out_c = run_hough(label, vert, backend="pallas_c2f")
    vx = np.asarray(out_x.valid)
    np.testing.assert_array_equal(vx, np.asarray(out_c.valid))
    np.testing.assert_allclose(
        np.asarray(out_x.rois)[vx], np.asarray(out_c.rois)[vx], rtol=1e-4, atol=1e-3
    )


def test_c2f_backend_train_mode_gt_matching():
    label, vert = make_scene([(2, 100.0, 60.0, 1.2, 30, 25)])
    gt = np.zeros((2, 13), np.float32)
    gt[0, 0] = 0
    gt[0, 1] = 2
    gt[0, 6] = 1.0
    gt[0, 10:13] = [0.05, 0.02, 1.2]
    gt_valid = np.array([True, False])
    out_x = run_hough(label, vert, is_train=True, gt_poses=gt, gt_valid=gt_valid, backend="xla")
    out_c = run_hough(label, vert, is_train=True, gt_poses=gt, gt_valid=gt_valid, backend="pallas_c2f")
    vx = np.asarray(out_x.valid)
    np.testing.assert_array_equal(vx, np.asarray(out_c.valid))
    np.testing.assert_allclose(
        np.asarray(out_x.poses_target)[vx], np.asarray(out_c.poses_target)[vx],
        rtol=1e-5, atol=1e-6,
    )


def test_pallas_backend_multi_instance_same_class():
    """Two instances of the SAME class in multi-instance mode
    (vote_threshold>0, 3×3 local maxima — ref .cu.cc:335-383): the
    exhaustive Pallas vote kernel must reproduce the XLA path's
    detections exactly (the c2f kernel is rejected for this mode)."""
    label, vert = make_scene(
        [(1, 40.0, 60.0, 1.0, 18, 18), (1, 120.0, 60.0, 1.0, 18, 18)]
    )
    kw = dict(vote_threshold=5.0, vote_percentage=0.0001)
    out_x = run_hough(label, vert, backend="xla", **kw)
    out_p = run_hough(label, vert, backend="pallas", **kw)
    vx = np.asarray(out_x.valid)
    np.testing.assert_array_equal(vx, np.asarray(out_p.valid))
    assert vx.sum() >= 2
    # the two instances tie on vote score, so row ORDER between
    # backends is float-noise arbitrary — compare as sets (sort by x1)
    ox = np.argsort(np.asarray(out_x.rois)[vx][:, 2], kind="stable")
    op_ = np.argsort(np.asarray(out_p.rois)[vx][:, 2], kind="stable")
    rois_x = np.asarray(out_x.rois)[vx][ox]
    rois_p = np.asarray(out_p.rois)[vx][op_]
    np.testing.assert_allclose(rois_x, rois_p, rtol=1e-4, atol=1e-3)
    # both true centers found by both backends
    cx = (rois_p[:, 2] + rois_p[:, 4]) / 2
    assert np.min(np.abs(cx - 40.0)) <= 3.0
    assert np.min(np.abs(cx - 120.0)) <= 3.0
    np.testing.assert_allclose(
        np.asarray(out_x.poses_init)[vx][ox], np.asarray(out_p.poses_init)[vx][op_],
        rtol=1e-4, atol=1e-4,
    )


def assert_multi_instance_parity(out_x, out_c, strong_frac=0.5, weak_tol_px=48.0):
    """Multi-instance candidate-set parity with plateau tolerance.

    Strong local maxima (votes ≥ strong_frac·max) must match
    cell-exactly. Weak candidates arise from equal-vote PLATEAUS in
    cone-overlap regions; which plateau cell gets emitted depends on
    global tie-jitter visibility (the reference CUDA emission order is
    atomics-nondeterministic there too, .cu.cc:377), so they are
    matched by (votes, center proximity) instead of exact cell."""
    vx = np.asarray(out_x.valid)
    vc = np.asarray(out_c.valid)
    assert vx.sum() == vc.sum()
    rx = np.asarray(out_x.rois)[vx]
    rc = np.asarray(out_c.rois)[vc]
    # primary key: votes rounded past cross-backend float noise —
    # tied candidates (same vote count) then order by position
    ox_ = np.lexsort((rx[:, 3], rx[:, 2], -np.round(rx[:, 6], 2)))
    oc_ = np.lexsort((rc[:, 3], rc[:, 2], -np.round(rc[:, 6], 2)))
    rx, rc = rx[ox_], rc[oc_]
    px_ = np.asarray(out_x.poses_init)[vx][ox_]
    pc_ = np.asarray(out_c.poses_init)[vc][oc_]
    np.testing.assert_allclose(rx[:, 6], rc[:, 6], rtol=1e-4, atol=1e-3)
    vmax = rx[:, 6].max() if len(rx) else 0.0
    strong = rx[:, 6] >= strong_frac * vmax
    np.testing.assert_allclose(rx[strong], rc[strong], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(px_[strong], pc_[strong], rtol=1e-4, atol=1e-4)
    # weak rows: same votes + nearby center (same plateau)
    used = set()
    for row in rc[~strong]:
        ctr = ((row[2] + row[4]) / 2, (row[3] + row[5]) / 2)
        found = None
        for j, xrow in enumerate(rx[~strong]):
            if j in used or abs(xrow[6] - row[6]) > 1e-3:
                continue
            xctr = ((xrow[2] + xrow[4]) / 2, (xrow[3] + xrow[5]) / 2)
            if np.hypot(ctr[0] - xctr[0], ctr[1] - xctr[1]) <= weak_tol_px:
                found = j
                break
        assert found is not None, f"unmatched weak candidate {row}"
        used.add(found)


def test_c2f_backend_multi_instance_same_class():
    """Multi-instance mode on the c2f backend: local maxima are found
    inside refined windows around greedily-suppressed coarse
    candidates and must reproduce the exhaustive path's detections
    (strong maxima cell-exactly; plateau ghosts by votes+location)."""
    label, vert = make_scene(
        [(1, 40.0, 60.0, 1.0, 18, 18), (1, 120.0, 60.0, 1.0, 18, 18)]
    )
    kw = dict(vote_threshold=5.0, vote_percentage=0.0001)
    out_x = run_hough(label, vert, backend="xla", **kw)
    out_c = run_hough(label, vert, backend="pallas_c2f", **kw)
    assert np.asarray(out_x.valid).sum() >= 2
    assert_multi_instance_parity(out_x, out_c)
    rois_c = np.asarray(out_c.rois)[np.asarray(out_c.valid)]
    cx = (rois_c[:, 2] + rois_c[:, 4]) / 2
    assert np.min(np.abs(cx - 40.0)) <= 3.0
    assert np.min(np.abs(cx - 120.0)) <= 3.0


def test_c2f_backend_multi_instance_close_pair():
    """Two same-class instances 13-22 px apart: instance B's peak can
    fall in the 3-cell undecidable edge band of instance A's window,
    where only a later window can rule on it — dedup must test
    decidability, not containment, or B is silently dropped
    (regression: containment-dedup lost the second object)."""
    for sep in (13.0, 16.0, 19.0, 22.0):
        label, vert = make_scene(
            [(1, 40.0, 60.0, 1.0, 10, 10), (1, 40.0 + sep, 60.0, 1.0, 10, 10)]
        )
        kw = dict(vote_threshold=5.0, vote_percentage=0.0001)
        out_x = run_hough(label, vert, backend="xla", **kw)
        out_c = run_hough(label, vert, backend="pallas_c2f", **kw)
        assert_multi_instance_parity(out_x, out_c)


def test_c2f_backend_multi_instance_mixed_and_corner():
    """Three instances over two classes, one at the image corner
    (window-origin clamping + grid-border local-max semantics)."""
    label, vert = make_scene(
        [
            (1, 30.0, 40.0, 0.9, 16, 16),
            (1, 110.0, 90.0, 1.4, 20, 16),
            (3, 8.0, 8.0, 1.1, 14, 14),
        ]
    )
    kw = dict(vote_threshold=4.0, vote_percentage=0.0001)
    out_x = run_hough(label, vert, backend="xla", **kw)
    out_c = run_hough(label, vert, backend="pallas_c2f", **kw)
    assert np.asarray(out_x.valid).sum() >= 3
    assert_multi_instance_parity(out_x, out_c)
    # all three true instance centers recovered
    rois_c = np.asarray(out_c.rois)[np.asarray(out_c.valid)]
    cx = (rois_c[:, 2] + rois_c[:, 4]) / 2
    cy = (rois_c[:, 3] + rois_c[:, 5]) / 2
    for tx, ty in ((30.0, 40.0), (110.0, 90.0), (8.0, 8.0)):
        assert np.min(np.hypot(cx - tx, cy - ty)) <= 4.0


def test_c2f_backend_batch4_chunked_matches_xla():
    """Batch > 2 pallas path: the (B·K)-slot pallas calls are chunked
    into 2-image groups (SMEM bound, ops/hough_voting._chunked_rows) —
    results must equal the dense XLA path per image."""
    import jax.numpy as jnp

    from posecnn_tpu.ops.hough_voting import hough_voting
    from tests.test_hough_voting import make_meta

    scenes = [
        [(1, 40.0, 40.0, 0.8, 22, 22)],
        [(2, 100.0, 60.0, 1.2, 30, 25)],
        [(3, 120.0, 80.0, 1.5, 25, 20)],
        [(1, 60.0, 70.0, 1.0, 20, 20), (3, 120.0, 40.0, 1.4, 22, 18)],
    ]
    labels, verts = [], []
    for objs in scenes:
        lab, vert = make_scene(objs)
        labels.append(lab)
        verts.append(vert)
    label = jnp.asarray(np.stack(labels))
    vert = jnp.asarray(np.stack(verts))
    meta = jnp.asarray(np.stack([make_meta()] * 4))
    kw = dict(
        label_threshold=100, num_samples=128, max_classes=3,
        max_objects_per_image=4, sample_chunk=8,
    )
    out_x = hough_voting(label, vert, jnp.asarray(EXTENTS), meta, backend="xla", **kw)
    out_c = hough_voting(
        label, vert, jnp.asarray(EXTENTS), meta, backend="pallas_c2f", **kw
    )
    vx, vc = np.asarray(out_x.valid), np.asarray(out_c.valid)
    np.testing.assert_array_equal(vx, vc)
    np.testing.assert_allclose(
        np.asarray(out_x.rois)[vx], np.asarray(out_c.rois)[vc], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_x.poses_init)[vx], np.asarray(out_c.poses_init)[vc],
        rtol=1e-4, atol=1e-4,
    )
