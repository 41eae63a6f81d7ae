"""Smoke tests for the manual-check CLI tools (ref: tools/test_icp.py,
tools/test_kinect_fusion.py, tools/test_synthesis*.py,
tools/render_poses.py) through their real argparse entry points at
tiny shapes."""

import json
import os

import numpy as np

TINY = [
    "--set",
    "train.num_classes=4",
    "train.syn_width=80",
    "train.syn_height=60",
]


def test_test_icp_cli(tmp_path):
    from posecnn_tpu.cli.test_icp import main

    out = tmp_path / "icp"
    main(
        ["--num_scenes", "1", "--num_iters", "3", "--output", str(out),
         "--visualize"] + TINY
    )
    report = json.load(open(out / "icp_report.json"))
    assert report["num_objects"] >= 1
    for obj in report["objects"]:
        assert np.isfinite(obj["after"]["te"])
        assert np.isfinite(obj["after"]["re"])
    assert any(f.endswith("-refined.png") for f in os.listdir(out))


def test_test_fusion_cli(tmp_path):
    from posecnn_tpu.cli.test_fusion import main

    out = tmp_path / "fusion"
    main(
        ["--num_steps", "2", "--grid_size", "32", "--output", str(out),
         "--visualize"] + TINY
    )
    report = json.load(open(out / "fusion_report.json"))
    assert report["surface_points"] >= 0
    assert report["raycast_depth_mae_m"] is None or report["raycast_depth_mae_m"] < 0.5
    assert len(report["tracking_trans_err_m"]) == 1
    assert any("raycast-label" in f for f in os.listdir(out))


def test_test_synthesis_cli(tmp_path):
    from posecnn_tpu.cli.test_synthesis import main

    out = tmp_path / "syn"
    main(["--num_samples", "4", "--save_images", "1", "--output", str(out)] + TINY)
    report = json.load(open(out / "synthesis_report.json"))
    assert report["num_samples"] == 4
    assert report["tz_within_config"]
    assert report["max_quat_norm_err"] < 1e-5
    assert report["mean_objects_per_scene"] >= 1
    assert os.path.exists(out / "000-color.png")


def test_render_poses_cli(tmp_path):
    """render_poses consumes demo-format results without source images
    (falls back to label-map rendering)."""
    from posecnn_tpu.cli.render_poses import main

    results = tmp_path / "results"
    os.makedirs(results)
    label = np.zeros((60, 80), np.int32)
    label[20:40, 30:60] = 2
    np.save(results / "000001-label.npy", label)
    dets = [
        {
            "frame": "000001",
            "seconds": 0.0,
            "detections": [
                {"class": 2, "class_name": "obj", "quat_wxyz": [1, 0, 0, 0],
                 "trans": [0.0, 0.0, 1.0]}
            ],
        }
    ]
    with open(results / "detections.json", "w") as f:
        json.dump(dets, f)
    out = tmp_path / "render"
    main(["--results", str(results), "--output", str(out), "--num_classes", "4"])
    assert os.path.exists(out / "000001-poses.png")


def test_render_poses_npz(tmp_path):
    """render_poses consumes test_net --save_results npz series."""
    from posecnn_tpu.cli.render_poses import main

    results = tmp_path / "results"
    os.makedirs(results)
    label = np.zeros((60, 80), np.int32)
    label[10:30, 10:40] = 1
    np.savez_compressed(
        results / "results_0000.npz",
        label=label,
        rois=np.zeros((4, 7), np.float32),
        keep=np.zeros((4,), bool),
        poses=np.array([[1, 0, 0, 0, 0.0, 0.0, 0.8]], np.float32),
        classes=np.array([1], np.int32),
    )
    out = tmp_path / "render"
    main(["--results", str(results), "--output", str(out), "--num_classes", "4"])
    assert os.path.exists(out / "0000-poses.png")
