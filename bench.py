"""Benchmark: PoseCNN single-frame inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: frames/sec of the full PoseCNN inference graph (VGG16 trunk +
seg + vertex + Hough voting + RoI pose head) at YCB-Video resolution
480×640, 21+1 classes — the reference's `im_segment_single_frame` hot
path (ref: lib/fcn/test.py:113-239, timed at test.py:1429-1430).

Timing protocol: on this image the TPU is reached through a tunnel
whose `block_until_ready` acknowledges DISPATCH, not execution —
async wall-clock timing reads ~100× too fast. So the iteration loop
runs INSIDE one jitted `lax.fori_loop` whose body carries a data
dependency (each frame perturbed by the previous checksum, preventing
CSE/hoisting), and time is measured by fetching the final scalar to
host — a true execution sync. Loop overhead is removed by differencing
an N₁-iteration and an N₂-iteration run of the SAME compiled fn.

vs_baseline: the PoseCNN paper/reference implementation runs ~10 fps
(0.1 s/frame) on a V100-class GPU for this path (the repo publishes no
number in-tree; BASELINE.md documents this envelope). vs_baseline =
fps / 10.0, i.e. ≥2.0 meets the "2× frames/s/chip vs V100" target.
"""

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the driver re-runs this every round and
    # the tunnel remote-compile is the dominant cost (~6-8 min)
    jax.config.update("jax_compilation_cache_dir", "/tmp/posecnn_jax_cache")
    import jax.numpy as jnp

    from __graft_entry__ import _make_inputs
    from posecnn_tpu.models import PoseCNN

    num_classes, height, width = 22, 480, 640
    model = PoseCNN(
        num_classes=num_classes,
        num_units=64,
        hough_num_samples=128,
        max_objects=8,
        hough_cell_stride=1,  # reference-exact Hough resolution
        vote_threshold=-1.0,
    )
    inp = _make_inputs(1, height, width, num_classes)
    params = model.init(
        jax.random.PRNGKey(0), inp["data"], inp["extents"], inp["meta"], train=False
    )

    @jax.jit
    def bench_fn(params, data, extents, meta, n):
        def body(i, acc):
            out = model.apply(
                params, data + acc * 1e-20, extents, meta, train=False
            )
            return (
                jnp.sum(out.hough.rois) * 1e-6
                + jnp.sum(out.label_2d) * 1e-9
                + jnp.sum(out.poses_pred) * 1e-6
            ).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    args = (params, inp["data"], inp["extents"], inp["meta"])
    # compile + full sync via host fetch
    float(bench_fn(*args, 1))

    # tunnel dispatch jitter: warm both call shapes, then take the
    # median of 3 differenced pairs (same protocol as bench_train)
    n1, n2 = 5, 45
    float(bench_fn(*args, n1))
    float(bench_fn(*args, n2))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_fn(*args, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_fn(*args, n2))
        t2 = time.perf_counter() - t0
        samples.append((t2 - t1) / (n2 - n1))
    samples.sort()
    dt = samples[1]
    fps = 1.0 / max(dt, 1e-9)
    print(
        json.dumps(
            {
                "metric": "posecnn_inference_fps_480x640_22cls_1chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 10.0, 2),
                "baseline_note": "envelope estimate: ~10 fps V100-class "
                "(repo publishes no in-tree number; BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
