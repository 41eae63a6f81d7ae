"""Benchmark: PoseCNN single-frame inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: frames/sec of the full PoseCNN inference graph (VGG16 trunk +
seg + vertex + Hough voting + RoI pose head) at YCB-Video resolution
480×640, 21+1 classes — the reference's `im_segment_single_frame` hot
path (ref: lib/fcn/test.py:113-239, timed at test.py:1429-1430).

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

    from __graft_entry__ import _make_inputs
    from posecnn_tpu.models import PoseCNN

    num_classes, height, width = 22, 480, 640
    model = PoseCNN(
        num_classes=num_classes,
        num_units=64,
        hough_num_samples=128,
        max_objects=8,
        hough_cell_stride=4,
        vote_threshold=-1.0,
    )
    inp = _make_inputs(1, height, width, num_classes)
    params = model.init(
        jax.random.PRNGKey(0), inp["data"], inp["extents"], inp["meta"], train=False
    )

    @jax.jit
    def fn(params, data, extents, meta):
        out = model.apply(params, data, extents, meta, train=False)
        return out.label_2d, out.hough.rois, out.hough.poses_init, out.poses_pred

    args = (params, inp["data"], inp["extents"], inp["meta"])
    # warmup / compile
    jax.block_until_ready(fn(*args))
    # timed
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fn(*args)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "posecnn_inference_fps_480x640_22cls_1chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
