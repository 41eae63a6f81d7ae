"""Hough phase timing + batched-inference throughput on one TPU chip.

Phases: (A) _prepare_slots sample extraction (counts/cumsum/search),
(B) Pallas vote kernel alone, (C) maxima+emission (full hough minus
A+B). Plus full-model fps at batch 4 (per-image amortization).

  setsid nohup python experiments/bench_hough_phases.py > /tmp/bench_phases.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n1=5, n2=25):
    float(fn(*args, 1))
    t0 = time.perf_counter()
    float(fn(*args, n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args, n2))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_inputs
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.ops.hough_voting import _prepare_slots
    from posecnn_tpu.ops.hough_pallas import hough_votes_pallas

    c, h, w = 22, 480, 640
    inp = _make_inputs(1, h, w, c)
    rng = np.random.RandomState(0)
    # realistic scene: 3 compact objects, rest background
    label_np = np.zeros((h, w), np.int32)
    for cls, cx, cy, r in [(3, 200, 240, 60), (9, 450, 300, 45), (15, 320, 120, 50)]:
        ys, xs = np.mgrid[0:h, 0:w]
        label_np[(np.abs(xs - cx) < r) & (np.abs(ys - cy) < r)] = cls
    label = jnp.asarray(label_np[None])
    vert = jnp.asarray(rng.randn(1, h, w, 3 * c).astype(np.float32) * 0.3)

    def report(name, dt):
        print(json.dumps({"phase": name, "ms": round(dt * 1e3, 3)}), flush=True)

    @jax.jit
    def f_prep(label, vert, extents, meta, n):
        def body(i, acc):
            prep = _prepare_slots(
                label[0], vert[0] + acc * 1e-20, extents, meta[0],
                num_classes=c, label_threshold=500, skip_pixels=10,
                num_samples=128, max_classes=8,
            )
            return (jnp.sum(prep["packed"]) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    report("prepare_slots", timed(f_prep, (label, vert, inp["extents"], inp["meta"])))

    # vote kernel alone, realistic bboxes (from the prep)
    prep = jax.jit(
        lambda l, v, e, m: _prepare_slots(
            l[0], v[0], e, m[0], num_classes=c, label_threshold=500,
            skip_pixels=10, num_samples=128, max_classes=8,
        )
    )(label, vert, inp["extents"], inp["meta"])
    packed = prep["packed"][None].reshape(8, 8, 128)
    bboxes = prep["bboxes"].reshape(8, 4)

    @jax.jit
    def f_votes(packed, bboxes, n):
        def body(i, acc):
            v, d = hough_votes_pallas(
                packed + acc * 1e-20, bboxes,
                cell_stride=1, grid_h=h, grid_w=w,
            )
            return (jnp.sum(v) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    report("vote_kernel_realistic", timed(f_votes, (packed, bboxes)))

    # batched full model: per-image cost at batch 4
    for b in (1, 4):
        inp_b = _make_inputs(b, h, w, c)
        model = PoseCNN(
            num_classes=c, num_units=64, hough_num_samples=128, max_objects=8,
            hough_cell_stride=1, vote_threshold=-1.0,
        )
        params = model.init(
            jax.random.PRNGKey(0), inp_b["data"], inp_b["extents"], inp_b["meta"], train=False
        )

        @jax.jit
        def f_full(p, data, extents, meta, n, model=model):
            def body(i, acc):
                out = model.apply(p, data + acc * 1e-20, extents, meta, train=False)
                return (
                    jnp.sum(out.hough.rois) * 1e-6 + jnp.sum(out.label_2d) * 1e-9
                    + jnp.sum(out.poses_pred) * 1e-6
                ).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        dt = timed(f_full, (params, inp_b["data"], inp_b["extents"], inp_b["meta"]))
        print(json.dumps({
            "phase": f"full_batch{b}", "ms_per_batch": round(dt * 1e3, 3),
            "ms_per_image": round(dt * 1e3 / b, 3),
            "fps_per_image": round(b / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
