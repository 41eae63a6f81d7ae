"""Video sequence generator → recurrent net end-to-end: camera motion
consistency + video training loss through the full pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.data.synthetic import (
    SyntheticSceneGenerator,
    SyntheticSequenceGenerator,
)

C = 4
H, W = 48, 64


def make_seq_gen(seed=3):
    rng = np.random.RandomState(0)
    points = (rng.rand(C, 48, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=W, height=H,
                                  min_objects=1, max_objects=2, t_near=0.7,
                                  t_far=1.1, seed=seed)
    return SyntheticSequenceGenerator(gen, num_steps=3)


def test_sequence_shapes_and_meta():
    sg = make_seq_gen()
    seq = sg.render_sequence()
    assert seq["image"].shape == (3, H, W, 3)
    assert seq["label"].shape == (3, H, W)
    assert seq["meta"].shape == (3, 48)
    # frame 0 camera = world: no relative transform recorded
    np.testing.assert_allclose(seq["meta"][0][18:42], 0.0)
    # later frames carry valid rotation blocks (orthonormal)
    r = seq["meta"][1][18:30].reshape(3, 4)[:, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # the scene persists: labeled pixels in every frame
    for t in range(3):
        assert (seq["label"][t] > 0).sum() > 20


def test_sequence_through_recurrent_net():
    from posecnn_tpu.engine.train import compute_video_losses
    from posecnn_tpu.models.recurrent import RecurrentSegNet

    sg = make_seq_gen()
    batch = sg.minibatch(1)
    frames = jnp.asarray(batch["image"])
    depths = jnp.asarray(batch["depth"])
    metas = jnp.asarray(batch["meta"])
    gt = jnp.asarray(batch["label"].astype(np.int32))
    model = RecurrentSegNet(num_classes=C, num_units=8)
    params = model.init(jax.random.PRNGKey(0), frames, depths, metas)
    loss, aux = compute_video_losses(model, params, frames, depths, metas, gt, C)
    assert np.isfinite(float(loss))
    assert aux["labels_pred"].shape == (3, 1, H, W)
