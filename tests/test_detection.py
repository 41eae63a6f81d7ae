"""Detection variant (RPN + RCNN + pose head) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.ops.rpn import (
    anchor_grid,
    anchor_target_layer,
    generate_anchors,
    proposal_layer,
    _random_keep,
)

C = 4
H, W = 64, 96  # image size; feature map 4×6 at stride 16


def test_generate_anchors_shapes():
    a = generate_anchors()
    assert a.shape == (9, 4)
    # anchors are centered on the base box center
    cx = (a[:, 0] + a[:, 2]) / 2
    np.testing.assert_allclose(cx, cx[0] * np.ones(9), atol=1.0)


def test_anchor_grid():
    base = generate_anchors()
    grid = anchor_grid(4, 6, 16, base)
    assert grid.shape == (4 * 6 * 9, 4)
    # first block equals base anchors
    np.testing.assert_allclose(grid[:9], base)
    # shift by one cell in x adds 16
    np.testing.assert_allclose(grid[9] - grid[0], [16, 0, 16, 0])


def test_random_keep_counts():
    mask = jnp.asarray(np.arange(100) < 40)
    kept = _random_keep(mask, 10, jax.random.PRNGKey(0))
    assert int(kept.sum()) == 10
    assert np.all(np.asarray(kept)[40:] == False)  # noqa: E712
    kept_all = _random_keep(mask, 80, jax.random.PRNGKey(0))
    assert int(kept_all.sum()) == 40


def test_proposal_layer_prefers_gt_like_anchor(rng):
    base = generate_anchors(scales=(2, 4, 8))
    fh, fw = H // 16, W // 16
    anchors = jnp.asarray(anchor_grid(fh, fw, 16, base))
    a = 9
    # score one anchor high: pick anchor index covering a box near (32, 32)
    cls_prob = np.full((fh, fw, 2 * a), 0.01, np.float32)
    cls_prob[2, 2, a + 3] = 0.99  # fg channel of anchor 3 at cell (2,2)
    bbox = np.zeros((fh, fw, 4 * a), np.float32)
    props = proposal_layer(
        jnp.asarray(cls_prob), jnp.asarray(bbox), anchors, H, W,
        post_nms_topk=8, min_size=4,
    )
    assert props.rois.shape == (8, 5)
    assert bool(props.valid[0])
    # top proposal is the highly scored anchor (clipped to image)
    top = np.asarray(props.rois[0, 1:5])
    exp = np.asarray(anchors.reshape(fh, fw, a, 4)[2, 2, 3])
    exp = np.clip(exp, 0, [W - 1, H - 1, W - 1, H - 1])
    np.testing.assert_allclose(top, exp, atol=1.0)


def test_anchor_target_layer_labels():
    base = generate_anchors(scales=(2,), ratios=(1.0,))
    fh, fw = H // 16, W // 16
    anchors = jnp.asarray(anchor_grid(fh, fw, 16, base))
    # one GT box exactly matching one anchor
    gt_box = np.asarray(anchors[9])  # some inside anchor
    gt = jnp.asarray(np.concatenate([gt_box, [1]])[None].astype(np.float32))
    at = anchor_target_layer(
        anchors, gt, jnp.asarray([True]), H, W, jax.random.PRNGKey(0)
    )
    labels = np.asarray(at.labels)
    assert labels[9] == 1  # exact match anchor is positive
    assert (labels == 1).sum() >= 1
    assert (labels == 0).sum() > 0
    # bbox target for the positive anchor is ~zero deltas
    np.testing.assert_allclose(np.asarray(at.bbox_targets)[9], 0.0, atol=1e-5)


def test_detection_model_forward_and_losses(rng):
    from posecnn_tpu.models.detection import PoseCNNDet, detection_losses

    model = PoseCNNDet(num_classes=C, fc_dim=32, post_nms_topk=16,
                       anchor_scales=(2, 4), anchor_ratios=(0.5, 1.0, 2.0),
                       compute_dtype=jnp.float32)
    data = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    gt_boxes = jnp.asarray([[10.0, 10, 40, 40, 2]])
    gt_poses = jnp.zeros((1, 13)).at[0, 6].set(1.0)
    gt_valid = jnp.asarray([True])
    params = model.init(
        jax.random.PRNGKey(0), data, gt_boxes, gt_poses, gt_valid,
        train=True, rng=jax.random.PRNGKey(1),
    )
    out = model.apply(
        params, data, gt_boxes, gt_poses, gt_valid, train=True,
        rng=jax.random.PRNGKey(1),
    )
    assert out.cls_logits.shape == (16, C)
    assert out.poses_pred.shape == (16, 4 * C)
    losses = detection_losses(out, C)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # gradients flow
    def loss_fn(p):
        o = model.apply(p, data, gt_boxes, gt_poses, gt_valid, train=True,
                        rng=jax.random.PRNGKey(1))
        return detection_losses(o, C)["loss"]

    g = jax.grad(loss_fn)(params)
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_anchor_target_border_gt_gets_positive():
    """Review-finding regression: a GT at the image border whose
    global-best anchor lies outside must still get a positive from the
    best INSIDE anchor."""
    base = generate_anchors(scales=(2, 4, 8), ratios=(1.0,))
    fh, fw = H // 16, W // 16
    anchors = anchor_grid(fh, fw, 16, base)
    # GT hugging the top-left corner: its globally-best (large) anchor
    # extends outside; a smaller inside anchor must become positive
    gt = jnp.asarray([[0.0, 0.0, 30.0, 30.0, 1.0]])
    at = anchor_target_layer(
        jnp.asarray(anchors), gt, jnp.asarray([True]), H, W, jax.random.PRNGKey(0)
    )
    assert int((np.asarray(at.labels) == 1).sum()) >= 1


def test_anchor_target_padded_gt_harmless():
    base = generate_anchors(scales=(2,), ratios=(1.0,))
    fh, fw = H // 16, W // 16
    anchors = jnp.asarray(anchor_grid(fh, fw, 16, base))
    gt_box = np.asarray(anchors[0])  # anchor 0 is the best for this GT
    gt = jnp.asarray(
        np.stack([np.concatenate([gt_box, [1]]), np.zeros(5)]).astype(np.float32)
    )
    at = anchor_target_layer(
        anchors, gt, jnp.asarray([True, False]), H, W, jax.random.PRNGKey(0)
    )
    # the padded GT row (routed to index 0) must not clobber anchor 0's
    # positive label from the valid GT
    labels = np.asarray(at.labels)
    inside0 = np.asarray(anchors[0])
    if (inside0 >= 0).all() and inside0[2] < W and inside0[3] < H:
        assert labels[0] == 1


def test_proposal_target_bbox_normalization():
    """BBOX_NORMALIZE_TARGETS_PRECOMPUTED (ref config.py:188-199):
    targets divided by stds; un-normalizing recovers the raw deltas."""
    from posecnn_tpu.ops.rpn import Proposals, proposal_target_layer

    g = 2
    gt_boxes = jnp.asarray(
        np.array([[10, 10, 40, 40, 1], [50, 20, 90, 60, 2]], np.float32)
    )
    gt_poses = jnp.zeros((g, 13))
    gt_valid = jnp.asarray([True, True])
    rois = jnp.asarray(
        np.array([[0, 12, 12, 38, 38], [0, 52, 22, 88, 58]], np.float32)
    )
    props = Proposals(
        rois=rois, scores=jnp.ones(2), valid=jnp.asarray([True, True])
    )
    kw = dict(rois_per_image=4, fg_fraction=1.0, fg_thresh=0.5,
              bg_thresh_hi=0.5, bg_thresh_lo=0.0)
    raw = proposal_target_layer(
        props, gt_boxes, gt_poses, gt_valid, C, jax.random.PRNGKey(0), **kw
    )
    stds = (0.1, 0.1, 0.2, 0.2)
    normed = proposal_target_layer(
        props, gt_boxes, gt_poses, gt_valid, C, jax.random.PRNGKey(0),
        bbox_normalize_means=(0.0, 0.0, 0.0, 0.0), bbox_normalize_stds=stds,
        **kw,
    )
    # same RoIs sampled (same rng) → normalized == raw / stds
    stds_full = np.tile(np.asarray(stds, np.float32), C)
    np.testing.assert_allclose(
        np.asarray(normed.bbox_targets),
        np.asarray(raw.bbox_targets) / stds_full[None, :],
        atol=1e-5,
    )
    assert np.abs(np.asarray(normed.bbox_targets)).max() > 0


def test_anchor_target_clobber_positives():
    """RPN_CLOBBER_POSITIVES=True lets the negative pass overwrite a
    best-per-GT anchor whose IoU is below the negative threshold."""
    # 16×16 anchors fully inside a 64×64 image; GT box small enough
    # that no anchor reaches 0.3 IoU (best IoU ≈ 0.06)
    base = generate_anchors(scales=(1,), ratios=(1.0,))
    anchors = jnp.asarray(anchor_grid(4, 4, 16, base))
    gt = jnp.asarray(np.array([[33, 33, 36, 36, 1]], np.float32))
    gtv = jnp.asarray([True])
    kw = dict(im_height=64, im_width=64, batch_size=16, fg_fraction=0.5)
    at_keep = anchor_target_layer(
        anchors, gt, gtv, rng=jax.random.PRNGKey(0),
        clobber_positives=False, **kw,
    )
    at_clob = anchor_target_layer(
        anchors, gt, gtv, rng=jax.random.PRNGKey(0),
        clobber_positives=True, **kw,
    )
    # without clobber the best anchor stays positive; with clobber the
    # low-IoU best anchor is relabeled negative → no positives at all
    assert int(np.sum(np.asarray(at_keep.labels) == 1)) >= 1
    assert int(np.sum(np.asarray(at_clob.labels) == 1)) == 0


def test_estimate_translation_from_box_recovers_depth():
    """Box-fit translation (ref compute_translations test.py:1639-1664):
    recover a known translation from the projected model bbox."""
    from posecnn_tpu.ops.rpn import estimate_translation_from_box
    from posecnn_tpu.utils.quaternion import quat_to_mat

    rng = np.random.RandomState(0)
    pts = (rng.rand(256, 3).astype(np.float32) - 0.5) * np.array(
        [0.12, 0.08, 0.06], np.float32
    )
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    for seed, t_gt in ((1, [0.1, -0.05, 1.3]), (2, [-0.2, 0.1, 0.6]), (3, [0.0, 0.0, 2.5])):
        q = np.random.RandomState(seed).randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        t_gt = np.asarray(t_gt, np.float32)
        r = np.asarray(quat_to_mat(jnp.asarray(q)))
        pc = pts @ r.T + t_gt
        u = k[0, 0] * pc[:, 0] / pc[:, 2] + k[0, 2]
        v = k[1, 1] * pc[:, 1] / pc[:, 2] + k[1, 2]
        box = np.array([u.min(), v.min(), u.max(), v.max()], np.float32)
        t_est = np.asarray(
            estimate_translation_from_box(
                jnp.asarray(q), jnp.asarray(box), jnp.asarray(pts), jnp.asarray(k)
            )
        )
        assert np.linalg.norm(t_est - t_gt) < 0.02 * t_gt[2], (t_gt, t_est)
