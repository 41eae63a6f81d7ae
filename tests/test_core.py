"""Core systems: config strictness, checkpoint save/restore with
shape tolerance, snapshot pruning, vgg16.npy import."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.core.config import Config, cfg_from_dict, cfg_to_dict
from posecnn_tpu.core.checkpoint import (
    import_vgg16_npy,
    prune_snapshots,
    restore_params,
    save_params,
    snapshot_path,
)


def test_config_defaults_match_reference():
    cfg = Config()
    # (ref: lib/fcn/config.py defaults)
    assert cfg.train.learning_rate == 0.001
    assert cfg.train.momentum == 0.9
    assert cfg.train.gamma == 0.1
    assert cfg.train.stepsize == 30000
    assert cfg.train.vertex_w == 5.0
    assert cfg.train.vertex_w_inside == 10.0
    assert cfg.train.weight_reg == 0.0001
    assert cfg.pixel_means == (102.9801, 115.9465, 122.7717)


def test_config_override_and_strictness():
    cfg = cfg_from_dict({"train": {"learning_rate": 0.01, "num_classes": 22}})
    assert cfg.train.learning_rate == 0.01
    assert cfg.train.num_classes == 22
    with pytest.raises(KeyError):
        cfg_from_dict({"train": {"no_such_key": 1}})
    with pytest.raises(TypeError):
        cfg_from_dict({"train": {"learning_rate": "fast"}})
    with pytest.raises(TypeError):
        cfg_from_dict({"train": {"single_frame": 3}})
    # round trip
    d = cfg_to_dict(cfg)
    assert d["train"]["num_classes"] == 22


def test_config_yaml_file(tmp_path):
    from posecnn_tpu.core.config import cfg_from_file

    p = tmp_path / "c.yaml"
    p.write_text("network: posecnn\ntrain:\n  max_iters: 5\n  vertex_reg_2d: true\n")
    cfg = cfg_from_file(str(p))
    assert cfg.train.max_iters == 5
    assert cfg.train.vertex_reg_2d is True


def _params(rng):
    return {
        "params": {
            "layer1": {"kernel": jnp.asarray(rng.randn(4, 8).astype(np.float32)), "bias": jnp.zeros(8)},
            "layer2": {"kernel": jnp.asarray(rng.randn(8, 2).astype(np.float32))},
        }
    }


def test_checkpoint_roundtrip(tmp_path, rng):
    params = _params(rng)
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params, step=42)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored, step = restore_params(path, zeroed, verbose=False)
    assert step == 42
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_tolerant_restore(tmp_path, rng):
    """Reference behavior (train.py:58-91): restore keeps the template
    where shapes mismatch — enables finetuning across head changes."""
    params = _params(rng)
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params, step=1)
    template = _params(rng)
    # change layer2's shape (a different head)
    template["params"]["layer2"]["kernel"] = jnp.ones((8, 5))
    restored, _ = restore_params(path, template, verbose=False)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["layer1"]["kernel"]),
        np.asarray(params["params"]["layer1"]["kernel"]),
    )
    np.testing.assert_allclose(np.asarray(restored["params"]["layer2"]["kernel"]), 1.0)


def test_snapshot_pruning(tmp_path, rng):
    params = _params(rng)
    for it in (10, 20, 30, 40):
        save_params(snapshot_path(str(tmp_path), "net", "", it), params, step=it)
    prune_snapshots(str(tmp_path), "net", keep=2)
    left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
    assert left == ["net_iter_30.npz", "net_iter_40.npz"]


def test_vgg16_npy_import(tmp_path, rng):
    """Caffe-format .npy import into the flax trunk (ref:
    Network.load network.py:71-107)."""
    from posecnn_tpu.models.vgg16 import VGG16Trunk

    trunk = VGG16Trunk(compute_dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # fabricate a reference-format npy with one known conv
    w = rng.randn(3, 3, 3, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    data = {"conv1_1": {"weights": w, "biases": b}}
    npy = str(tmp_path / "vgg16.npy")
    np.save(npy, data, allow_pickle=True)
    loaded = import_vgg16_npy(npy, params)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1_1"]["kernel"]), w
    )
    np.testing.assert_allclose(np.asarray(loaded["params"]["conv1_1"]["bias"]), b)
    # untouched layers keep their init
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1_2"]["kernel"]),
        np.asarray(params["params"]["conv1_2"]["kernel"]),
    )


def test_vgg16_npy_import_fc(tmp_path, rng):
    """fc6/fc7 ImageNet weights DO load into the pose head — the 7×7
    RoI pool makes fc6's input 7·7·512=25088, exactly VGG's (ref:
    network.py:71-107 assigns every shape-matching variable;
    vgg16_convs.py:178,188). fc8 (ImageNet 1000-way) must be skipped
    by the shape check."""
    from posecnn_tpu.models.posecnn import PoseHead

    fc_dim = 64
    head = PoseHead(num_classes=3, fc_dim=fc_dim, compute_dtype=jnp.float32)
    pooled = jnp.zeros((2, 7, 7, 512))
    pw = jnp.zeros((2, 12))
    params = head.init(jax.random.PRNGKey(0), pooled, pw, train=False)
    w6 = rng.randn(25088, fc_dim).astype(np.float32)
    b6 = rng.randn(fc_dim).astype(np.float32)
    w7 = rng.randn(fc_dim, fc_dim).astype(np.float32)
    w8 = rng.randn(fc_dim, 1000).astype(np.float32)  # ImageNet classifier
    data = {
        "fc6": {"weights": w6, "biases": b6},
        "fc7": {"weights": w7, "biases": np.zeros(fc_dim, np.float32)},
        "fc8": {"weights": w8, "biases": np.zeros(1000, np.float32)},
    }
    npy = str(tmp_path / "vgg16.npy")
    np.save(npy, data, allow_pickle=True)
    loaded = import_vgg16_npy(npy, params)
    np.testing.assert_allclose(np.asarray(loaded["params"]["fc6"]["kernel"]), w6)
    np.testing.assert_allclose(np.asarray(loaded["params"]["fc6"]["bias"]), b6)
    np.testing.assert_allclose(np.asarray(loaded["params"]["fc7"]["kernel"]), w7)
    # fc8 shape-mismatched (4C=12 vs 1000) → keeps its init
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["fc8"]["kernel"]),
        np.asarray(params["params"]["fc8"]["kernel"]),
    )


def test_all_experiment_cfgs_parse():
    """Every YAML in experiments/cfgs must pass the strict overlay
    (unknown keys / type mismatches raise — ref: _merge_a_into_b
    lib/fcn/config.py:271-296)."""
    import glob
    import os

    from posecnn_tpu.core.config import cfg_from_file

    root = os.path.join(os.path.dirname(__file__), "..", "experiments", "cfgs")
    files = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(files) >= 16
    for f in files:
        cfg = cfg_from_file(f)
        assert cfg.train.num_classes >= 2


def test_checkpoint_head_metadata_roundtrip(tmp_path, rng):
    """Head-semantics flags recorded per snapshot and ADOPTED by
    eval/serve model construction (advisor r4: norm_features /
    quat_activation change the computation at identical param shapes,
    so silent cfg/ckpt mismatch = wrong poses with no error)."""
    from posecnn_tpu.cli.common import head_flags_from_ckpt
    from posecnn_tpu.core.checkpoint import read_ckpt_meta
    from posecnn_tpu.core.config import cfg_from_dict

    params = {"w": rng.rand(3, 3).astype(np.float32)}
    path = str(tmp_path / "snap_iter_10.npz")
    save_params(path, params, step=10, meta={
        "norm_features": False, "quat_activation": "tanh",
        "pose_pool_size": 14, "train_scale_base": 0.5,
    })
    meta = read_ckpt_meta(path)
    assert meta["quat_activation"] == "tanh"
    assert bool(meta["norm_features"]) is False
    assert float(meta["train_scale_base"]) == 0.5
    # cfg says linear/True/7 — the checkpoint's record must win
    cfg = cfg_from_dict({})
    flags = head_flags_from_ckpt(cfg, path)
    assert flags == {"norm_features": False, "quat_activation": "tanh",
                     "pose_pool_size": 14}
    # a pre-metadata checkpoint falls back to cfg defaults
    legacy = str(tmp_path / "legacy_iter_5.npz")
    save_params(legacy, params, step=5)
    flags = head_flags_from_ckpt(cfg, legacy)
    assert flags["quat_activation"] == cfg.train.quat_activation
    # restore still works alongside metadata entries
    restored, step = restore_params(path, {"w": np.zeros((3, 3), np.float32)}, verbose=False)
    assert step == 10
    np.testing.assert_array_equal(np.asarray(restored["w"]), params["w"])
