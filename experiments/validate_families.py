"""Per-round TPU validation of every trainable network family.

The CI suite runs all families on the virtual-CPU mesh only, and the
flagship posecnn graph is the only one exercised on the real chip by
training runs + validate_tpu. This script drives the OTHER families
through the real CLI on the real TPU — tiny synthetic shapes, a few
dozen iterations each — and asserts the loss is finite and moved.
(Ref coverage: vgg16_det lib/networks/vgg16_det.py, vgg16 video
lib/networks/vgg16.py, fcn8_vgg.py, resnet50.py, vgg16_gan.py — the
reference never smoke-tests these together either; this is the test
pyramid SURVEY §4 says we must create.)

Run detached (each family compiles 2-10 min over the tunnel):
  setsid nohup python experiments/validate_families.py \
      > experiments/logs/validate_families.log 2>&1 &
Writes one JSON line to stdout + output/validate_families.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SMALL = [
    "train.syn_height=120",
    "train.syn_width=160",
    "train.display=10",
    "train.snapshot_iters=1000000",
]

FAMILIES = {
    "posecnn_det": {
        "cfg": "experiments/cfgs/lov_det.yaml",
        "set": SMALL + ["train.num_classes=6", "train.synthesize=false"],
    },
    "recurrent_seg": {
        "cfg": "experiments/cfgs/lov_color_rnn.yaml",
        "set": SMALL + ["train.num_classes=6", "train.num_steps=3"],
    },
    "fcn8": {
        "cfg": "experiments/cfgs/rgbd_scene_single_color_fcn8.yaml",
        "set": SMALL + ["train.num_classes=6"],
    },
    "resnet50_seg": {
        "cfg": "experiments/cfgs/rgbd_scene_single_color.yaml",
        "set": SMALL + ["network=resnet50_seg", "train.num_classes=6"],
    },
    "posecnn_gan": {
        "cfg": "experiments/cfgs/shapenet_single_color_gan.yaml",
        "set": SMALL + ["train.num_classes=6"],
    },
}


def run_family(name: str, spec: dict, iters: int) -> dict:
    import shutil

    out_dir = f"output/valfam_{name}"
    # train_net appends to metrics.jsonl — a stale dir would mix rows
    # from previous rounds into loss_first/finite checks
    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        sys.executable, "-m", "posecnn_tpu.cli.train_net",
        "--cfg", spec["cfg"],
        "--dataset", "synthetic",
        "--data_root", "/nonexistent",  # force synthetic class geometry
        "--iters", str(iters),
        "--output", out_dir,
        "--set", *spec["set"],
    ]
    if os.environ.get("VALFAM_DEVICE"):  # CPU smoke mode for dev
        cmd += ["--device", os.environ["VALFAM_DEVICE"]]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    wall = round(time.time() - t0, 1)
    result = {"family": name, "rc": proc.returncode, "wall_s": wall}
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    rows = []
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
    if rows:
        loss_key = next(
            (k for k in ("loss", "loss_total", "g_loss") if k in rows[0]), None
        )
        if loss_key:
            first, last = rows[0][loss_key], rows[-1][loss_key]
            result.update(
                loss_first=round(float(first), 4),
                loss_last=round(float(last), 4),
                finite=bool(
                    all(
                        abs(float(r[loss_key])) < 1e6
                        and float(r[loss_key]) == float(r[loss_key])
                        for r in rows
                    )
                ),
                # loss must actually move — identical values at every
                # logged iter means gradients are not flowing
                moved=bool(
                    len({round(float(r[loss_key]), 6) for r in rows}) > 1
                    or len(rows) < 2
                ),
            )
    result["ok"] = bool(
        proc.returncode == 0
        and rows
        and result.get("finite", False)
        and result.get("moved", False)
    )
    if not result["ok"]:
        result["stderr_tail"] = proc.stderr[-2000:]
    return result


def main():
    iters = int(os.environ.get("VALFAM_ITERS", "40"))
    results = []
    for name, spec in FAMILIES.items():
        print(f"=== {name} ===", flush=True)
        try:
            res = run_family(name, spec, iters)
        except subprocess.TimeoutExpired:
            res = {"family": name, "ok": False, "error": "timeout"}
        print(json.dumps(res), flush=True)
        results.append(res)
    summary = {
        "metric": "validate_families",
        "n_ok": sum(r["ok"] for r in results),
        "n_total": len(results),
        "families": results,
    }
    os.makedirs("output", exist_ok=True)
    with open("output/validate_families.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "families"}))
    return 0 if summary["n_ok"] == summary["n_total"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
