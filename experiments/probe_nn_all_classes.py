"""Per-class data-side rotation observability sweep (r4 verdict task 4).

Runs the NN-in-pixel-space oracle (probe_data_nn.py) for EVERY object
class and aggregates one JSON — the architecture-independent bound on
how much rotation the rendered appearance of each class carries. Used
to split the 22-class oracle's per-class laggards into:

  - high NN error too   -> the DATA is the problem for that class
    (markers occluded / near-symmetric geometry): fix the paint or use
    symmetric-aware supervision (the reference's ADD-S treatment of
    its near-symmetric classes, lib/datasets/lov.py:539-541);
  - NN fine, net lags   -> training/architecture problem (sample share,
    pooling resolution).

CPU-only; ~30 s/class at the default n.

  python experiments/probe_nn_all_classes.py --n 1200 --holdout 200
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1200)
    ap.add_argument("--holdout", type=int, default=200)
    ap.add_argument("--num_classes", type=int, default=22)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--out", default="output/probe_nn_all_classes.json")
    args = ap.parse_args()

    os.makedirs("output/nn_sweep", exist_ok=True)
    jobs = {}
    results = {}
    pending = list(range(1, args.num_classes))

    def launch(cls):
        out = f"output/nn_sweep/cls_{cls}.json"
        p = subprocess.Popen(
            [
                sys.executable, os.path.join(HERE, "probe_data_nn.py"),
                "--n", str(args.n), "--holdout", str(args.holdout),
                "--cls_index", str(cls), "--out", out,
            ],
            stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
        )
        jobs[cls] = (p, out)

    while pending or jobs:
        while pending and len(jobs) < args.jobs:
            launch(pending.pop(0))
        done = [c for c, (p, _) in jobs.items() if p.poll() is not None]
        for c in done:
            p, out = jobs.pop(c)
            if p.returncode == 0 and os.path.exists(out):
                with open(out) as f:
                    d = json.load(f)
                results[c] = {
                    "nn_mean_deg": d["nn_mean_deg"],
                    "nn_median_deg": d["nn_median_deg"],
                    "n_test": d["n_test"],
                    "chance_mean_deg": d["chance_mean_deg"],
                }
                print(f"class {c}: NN mean {d['nn_mean_deg']}° median "
                      f"{d['nn_median_deg']}° (n={d['n_test']})", flush=True)
            else:
                results[c] = {"error": f"rc={p.returncode}"}
                print(f"class {c}: FAILED rc={p.returncode}", flush=True)
        if not done:
            import time

            time.sleep(3)

    ok = [r for r in results.values() if "nn_mean_deg" in r]
    summary = {
        "metric": "data_nn_rotation_oracle_all_classes",
        "n_per_class": args.n,
        "holdout_per_class": args.holdout,
        "mean_over_classes_deg": round(
            sum(r["nn_mean_deg"] for r in ok) / max(len(ok), 1), 1
        ),
        "per_class": {str(c): results[c] for c in sorted(results)},
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_class"}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
