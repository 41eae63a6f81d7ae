"""GAN models + matching loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models.gan import (
    DCGANDiscriminator,
    DCGANGenerator,
    FeatureDiscriminator,
    gan_losses,
)
from posecnn_tpu.ops.matching_loss import matching_loss, soft_silhouette


def test_dcgan_shapes(rng):
    g = DCGANGenerator()
    z = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    gp = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(gp, z)
    assert img.shape == (2, 64, 64, 3)
    assert float(jnp.abs(img).max()) <= 1.0

    d = DCGANDiscriminator()
    dp = d.init(jax.random.PRNGKey(1), img)
    logits = d.apply(dp, img)
    assert logits.shape == (2, 1)

    d_loss, g_loss = gan_losses(logits + 3.0, logits - 3.0)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


def test_feature_discriminator(rng):
    fd = FeatureDiscriminator()
    feats = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    p = fd.init(jax.random.PRNGKey(0), feats)
    out = fd.apply(p, feats)
    assert out.shape[0] == 1 and out.shape[-1] == 1


def _setup_matching(rng):
    k = np.array([[40.0, 0, 40], [0, 40.0, 30], [0, 0, 1]], np.float32)
    pts = (rng.rand(64, 3).astype(np.float32) - 0.5) * 0.2
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.array([0.0, 0.0, 1.0], np.float32)
    return k, pts, q, t


def test_matching_loss_zero_at_truth(rng):
    k, pts, q, t = _setup_matching(rng)
    target = soft_silhouette(jnp.asarray(q), jnp.asarray(t), jnp.asarray(pts), jnp.asarray(k))
    loss_true = float(
        matching_loss(jnp.asarray(q), jnp.asarray(t), target, jnp.asarray(pts), jnp.asarray(k))
    )
    t_off = t + np.array([0.08, 0.0, 0.0], np.float32)
    loss_off = float(
        matching_loss(jnp.asarray(q), jnp.asarray(t_off), target, jnp.asarray(pts), jnp.asarray(k))
    )
    assert loss_true < 1e-5
    assert loss_off > loss_true + 0.05


def test_matching_loss_gradient_points_home(rng):
    k, pts, q, t = _setup_matching(rng)
    target = soft_silhouette(jnp.asarray(q), jnp.asarray(t), jnp.asarray(pts), jnp.asarray(k))
    t_off = jnp.asarray(t + np.array([0.05, 0.0, 0.0], np.float32))

    g = jax.grad(
        lambda tt: matching_loss(jnp.asarray(q), tt, target, jnp.asarray(pts), jnp.asarray(k))
    )(t_off)
    # gradient in +x reduces loss by moving back toward truth → positive
    assert float(g[0]) > 0


def test_gan_train_step_runs_and_improves_discriminator():
    """Adversarial vertex-map training (vgg16_gan variant): one jitted
    step updates both generator and discriminator; losses finite and
    d_loss falls over repeated steps on a fixed batch."""
    import jax
    import jax.numpy as jnp

    from posecnn_tpu.core.config import cfg_from_dict
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import (
        create_gan_train_state,
        make_gan_train_step,
    )
    from posecnn_tpu.models import FeatureDiscriminator, PoseCNN

    c, h, w = 4, 48, 64
    rng = np.random.RandomState(0)
    points = (rng.rand(c, 32, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=w, height=h, seed=5)
    batch = {key: jnp.asarray(v) for key, v in gen.minibatch(2).items()}
    cfg = cfg_from_dict(
        {
            "train": {
                "num_classes": c, "vertex_reg_2d": True, "pose_reg": True,
                "gan": True, "gan_weight": 0.1, "learning_rate": 0.0002,
                "ims_per_batch": 2, "hough_num_samples": 64, "max_rois": 4,
            }
        }
    )
    model = PoseCNN(
        num_classes=c, num_units=16, fc_dim=64, hough_num_samples=64,
        max_objects=2, hough_cell_stride=2, compute_dtype=jnp.float32,
    )
    disc = FeatureDiscriminator()
    state = create_gan_train_state(
        cfg, model, disc, jax.random.PRNGKey(0), batch, jnp.asarray(extents)
    )
    step = make_gan_train_step(
        cfg, model, disc,
        jnp.asarray(points), jnp.asarray(extents), jnp.asarray(np.zeros(c, np.float32)),
        donate=False,
    )
    d_losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["loss_g_adv"]))
        d_losses.append(float(m["loss_d"]))
    assert d_losses[-1] < d_losses[0]  # D learns real vs fake


def test_gan_step_sparse_vertex_feed():
    """GAN step with the sparse vertex contract: the discriminator's
    real input is built on device (engine/train.py)."""
    from posecnn_tpu.core.config import cfg_from_dict
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import (
        create_gan_train_state,
        make_gan_train_step,
    )
    from posecnn_tpu.models import FeatureDiscriminator, PoseCNN

    c, h, w = 4, 48, 64
    rng = np.random.RandomState(0)
    points = (rng.rand(c, 32, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=w, height=h, seed=6)
    batch = {
        key: jnp.asarray(v)
        for key, v in gen.minibatch(2, dense_vertex_targets=False).items()
    }
    assert "vertex_targets" not in batch
    cfg = cfg_from_dict(
        {
            "train": {
                "num_classes": c, "vertex_reg_2d": True, "pose_reg": True,
                "gan": True, "gan_weight": 0.1, "learning_rate": 0.0002,
                "ims_per_batch": 2, "hough_num_samples": 64, "max_rois": 4,
            }
        }
    )
    model = PoseCNN(
        num_classes=c, num_units=16, fc_dim=64, hough_num_samples=64,
        max_objects=2, hough_cell_stride=2, compute_dtype=jnp.float32,
    )
    disc = FeatureDiscriminator()
    state = create_gan_train_state(
        cfg, model, disc, jax.random.PRNGKey(0), batch, jnp.asarray(extents)
    )
    step = make_gan_train_step(
        cfg, model, disc,
        jnp.asarray(points), jnp.asarray(extents),
        jnp.asarray(np.zeros(c, np.float32)), donate=False,
    )
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_d"]))
    assert np.isfinite(float(m["loss_g_adv"]))
