"""train_net CLI network-family dispatch (ref: get_network factory
lib/networks/factory.py:22-51 + train_net/train_net_det selection in
tools/train_net.py): every registered trainable family runs 2 iters
and snapshots through the same CLI entry point."""

import json
import os

import pytest


def _run(tmp_path, extra):
    from posecnn_tpu.cli.train_net import main

    out = tmp_path / "train"
    main(
        [
            "--dataset", "synthetic", "--data_root", "/nonexistent",
            "--iters", "2", "--output", str(out), "--num_data", "1",
            "--set", "compute_dtype=float32",
            "train.num_classes=4", "train.syn_width=64", "train.syn_height=48",
            "train.display=1", "train.snapshot_iters=1000",
            "train.ims_per_batch=1", "train.fc_dim=32", "train.num_units=8",
        ]
        + extra
    )
    files = os.listdir(out)
    assert any(f.endswith(".npz") for f in files), files
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    assert len(metrics) >= 2
    assert all(m["loss"] == m["loss"] for m in metrics)  # not NaN
    return metrics


def test_train_net_det_dispatch(tmp_path):
    m = _run(tmp_path, ["network=posecnn_det", "anchor_scales=[2,4]"])
    assert "rpn_cls" in m[0] and "rcnn_cls" in m[0]


def test_train_net_fcn8_dispatch(tmp_path):
    m = _run(tmp_path, ["network=fcn8"])
    assert "loss_cls" in m[0]


def test_train_net_resnet50_dispatch(tmp_path):
    m = _run(tmp_path, ["network=resnet50_seg"])
    assert "loss_cls" in m[0]


def test_train_net_recurrent_dispatch(tmp_path):
    _run(tmp_path, ["network=recurrent_seg", "train.num_steps=2"])


def test_train_net_gan_dispatch(tmp_path):
    m = _run(
        tmp_path,
        ["train.gan=true", "train.vertex_reg_2d=true",
         "train.learning_rate=0.0002", "train.num_units=16",
         "train.hough_num_samples=64", "train.max_rois=9",
         "train.add_num_points=32"],
    )
    assert "loss_d" in m[0] and "loss_g_adv" in m[0]


def test_train_net_unknown_network(tmp_path):
    with pytest.raises(ValueError, match="unknown network"):
        _run(tmp_path, ["network=nope"])


def test_train_net_auto_resume(tmp_path):
    """--resume picks the newest snapshot in --output and continues
    numbering from its step (resume-aware train_loop)."""
    import numpy as np

    from posecnn_tpu.cli.train_net import main

    out = tmp_path / "train"
    base = [
        "--dataset", "synthetic", "--data_root", "/nonexistent",
        "--output", str(out), "--num_data", "1",
        "--set", "compute_dtype=float32",
        "train.num_classes=4", "train.syn_width=64", "train.syn_height=48",
        "train.display=1", "train.snapshot_iters=2",
        "train.ims_per_batch=1", "train.fc_dim=32", "train.num_units=8",
        "train.vertex_reg_2d=true", "train.pose_reg=true",
        "train.hough_num_samples=64", "train.max_rois=9",
        "train.add_num_points=32",
    ]
    main(["--iters", "2"] + base)
    snaps1 = {f for f in os.listdir(out) if f.endswith(".npz")}
    assert any("_iter_2" in f for f in snaps1)
    main(["--iters", "4", "--resume"] + base)
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    iters = [m["iter"] for m in metrics]
    # second run continued at 3,4 — not restarting at 1
    assert iters == [1, 2, 3, 4], iters
    assert any("_iter_4" in f for f in os.listdir(out))
