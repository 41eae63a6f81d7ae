"""CLI end-to-end smoke tests: train_net (2 iters + snapshot) and
test_net (2 images → eval.json) through their real argparse entry
points at tiny shapes (ref workflow: tools/train_net.py,
tools/test_net.py driven by experiments/scripts/*.sh)."""

import json
import os

TINY = [
    "--set",
    "compute_dtype=float32",
    "train.num_classes=4",
    "train.num_units=16",
    "train.fc_dim=64",
    "train.syn_width=64",
    "train.syn_height=48",
    "train.hough_num_samples=64",
    "train.max_rois=4",
    "train.ims_per_batch=2",
    "train.vertex_reg_2d=true",
    "train.pose_reg=true",
    "train.add_num_points=32",
    "train.snapshot_iters=1000",
    "train.display=1",
    "test.hough_num_samples=64",
]


def test_train_net_cli(tmp_path):
    from posecnn_tpu.cli.train_net import main

    out = tmp_path / "train"
    main(
        [
            "--dataset", "synthetic", "--data_root", "/nonexistent",
            "--iters", "2", "--output", str(out), "--num_data", "1",
        ]
        + TINY
    )
    files = os.listdir(out)
    assert any(f.endswith(".npz") for f in files), files
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    assert len(metrics) >= 1
    assert "loss" in metrics[0]


def test_test_net_cli(tmp_path):
    from posecnn_tpu.cli.test_net import main

    out = tmp_path / "eval"
    summary = main(
        [
            "--dataset", "synthetic", "--data_root", "/nonexistent",
            "--num_images", "2", "--output", str(out), "--save_results",
        ]
        + TINY
    )
    assert os.path.exists(out / "eval.json")
    assert "seg_iou_mean" in summary or "add_s_auc" in summary or len(summary) > 0
    # per-image artifacts (ref: imdb save_result .mat files)
    import numpy as np

    arts = sorted(f for f in os.listdir(out) if f.startswith("results_"))
    assert len(arts) == 2
    z = np.load(out / arts[0])
    assert z["label"].shape == (48, 64)
    assert z["rois"].shape[1] == 7


def test_test_net_cli_rgbd(tmp_path):
    """RGBD eval end-to-end: dual-tower model + synthetic depth blob
    (regression: eval used to drop data_p and build a COLOR model)."""
    from posecnn_tpu.cli.test_net import main

    out = tmp_path / "eval_rgbd"
    summary = main(
        [
            "--dataset", "synthetic", "--data_root", "/nonexistent",
            "--num_images", "1", "--output", str(out),
            "--set", "input=RGBD",
        ]
        + TINY[1:]
    )
    assert os.path.exists(out / "eval.json")


def test_test_net_cli_detection(tmp_path):
    """Detection-variant eval (RPN → RoI head → per-class NMS → AP@0.5,
    ref: test_net_detection) through the CLI."""
    from posecnn_tpu.cli.test_net import main

    out = tmp_path / "eval_det"
    result = main(
        [
            "--dataset", "synthetic", "--data_root", "/nonexistent",
            "--num_images", "1", "--output", str(out),
            "--set",
            "network=posecnn_det",
            "compute_dtype=float32",
            "train.num_classes=4",
            "train.fc_dim=64",
            "train.syn_width=64",
            "train.syn_height=48",
        ]
    )
    assert "map" in result
    assert os.path.exists(out / "eval_det.json")
