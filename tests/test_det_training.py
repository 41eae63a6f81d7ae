"""Detection-variant training: the det train step reduces loss on a
fixed synthetic batch (train_net_det equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.core.config import cfg_from_dict
from posecnn_tpu.data.minibatch import label_to_boxes
from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
from posecnn_tpu.engine.train import TrainState, create_optimizer, make_det_train_step
from posecnn_tpu.models.detection import PoseCNNDet

C = 4
H, W = 48, 64


def test_label_to_boxes():
    lab = np.zeros((20, 30), np.int64)
    lab[5:10, 8:20] = 2
    boxes = label_to_boxes(lab, np.array([2, 3]))
    assert boxes.shape == (1, 5)
    np.testing.assert_allclose(boxes[0], [8, 5, 19, 9, 2])


def test_det_train_step_reduces_loss(rng):
    cfg = cfg_from_dict(
        {"train": {"num_classes": C, "learning_rate": 0.001, "weight_reg": 0.0}}
    )
    model = PoseCNNDet(
        num_classes=C, fc_dim=32, post_nms_topk=16,
        anchor_scales=(2, 4), anchor_ratios=(1.0,), compute_dtype=jnp.float32,
    )
    points = (rng.rand(C, 16, 3).astype(np.float32) - 0.5) * 0.12
    extents = np.abs(points).max(1) * 2
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=W, height=H,
                                  min_objects=1, max_objects=2, t_near=0.6,
                                  t_far=1.0, seed=11)
    s = gen.render()
    boxes = label_to_boxes(s.label, s.poses[:, 1].astype(int))
    gt_boxes = np.zeros((4, 5), np.float32)
    gt_valid = np.zeros(4, bool)
    gt_boxes[: len(boxes)] = boxes
    gt_valid[: len(boxes)] = True
    gt_poses = np.zeros((4, 13), np.float32)
    gt_poses[: len(s.poses)] = s.poses[:4]

    batch = {
        "data": jnp.asarray(s.image[None]),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_poses": jnp.asarray(gt_poses),
        "gt_valid": jnp.asarray(gt_valid),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["data"], batch["gt_boxes"],
        batch["gt_poses"], batch["gt_valid"], train=True, rng=jax.random.PRNGKey(1),
    )
    opt = create_optimizer(cfg, params)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_det_train_step(cfg, model, donate=False)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
