"""Where do the ~3 ms of the serving graph go? (r4 verdict task 6)

Times nested subsets of the bench.py graph (480×640, b1, stride-1
single-instance Hough) with the fori_loop differencing protocol:

  A trunk+seg           (vertex_reg=False)
  B + vertex head+hough (pose_reg=False)
  C + pose head = full  (bench.py graph)

so hough+vertex ≈ B−A and the pose head ≈ C−B. Also times the c2f
vote kernel alone at candidate tunings (coarse_factor, top_t, coarse
sample subset) to guide the cut, with exhaustive-parity checked on
REAL data by experiments/validate_tpu.py before any default changes.

  setsid nohup python experiments/bench_graph_phases.py \
      > experiments/logs/bench_graph_phases.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n1=5, n2=45):
    float(fn(*args, 1))
    float(fn(*args, n1))
    float(fn(*args, n2))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*args, n2))
        t2 = time.perf_counter() - t0
        samples.append((t2 - t1) / (n2 - n1))
    samples.sort()
    return samples[1]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/posecnn_jax_cache")
    import jax.numpy as jnp

    from __graft_entry__ import _make_inputs
    from posecnn_tpu.models import PoseCNN

    c, h, w = 22, 480, 640
    inp = _make_inputs(1, h, w, c)
    results = {}

    def model_time(name, **kw):
        model = PoseCNN(
            num_classes=c, num_units=64, hough_num_samples=128,
            max_objects=8, hough_cell_stride=1, vote_threshold=-1.0, **kw,
        )
        params = model.init(
            jax.random.PRNGKey(0), inp["data"], inp["extents"], inp["meta"],
            train=False,
        )

        @jax.jit
        def f(p, data, extents, meta, n):
            def body(i, acc):
                out = model.apply(p, data + acc * 1e-20, extents, meta, train=False)
                parts = jnp.sum(out.label_2d) * 1e-9
                if out.hough is not None:
                    parts = parts + jnp.sum(out.hough.rois) * 1e-6
                if out.poses_pred is not None:
                    parts = parts + jnp.sum(out.poses_pred) * 1e-6
                return parts.astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        dt = timed(f, (params, inp["data"], inp["extents"], inp["meta"]))
        results[name] = round(dt * 1e3, 3)
        print(json.dumps({"phase": name, "ms": results[name]}), flush=True)

    model_time("A_trunk_seg", vertex_reg=False, pose_reg=False)
    model_time("B_plus_vertex_hough", vertex_reg=True, pose_reg=False)
    model_time("C_full", vertex_reg=True, pose_reg=True)

    # batched serving graph: with the r6 chunked-c2f hough the auto
    # backend no longer falls back to the dense XLA reduction at b>2
    # (r5 measured 6.25 ms/img at b4 on the fallback)
    inp4 = _make_inputs(4, h, w, c)
    model4 = PoseCNN(
        num_classes=c, num_units=64, hough_num_samples=128,
        max_objects=8, hough_cell_stride=1, vote_threshold=-1.0,
    )
    params4 = model4.init(
        jax.random.PRNGKey(0), inp4["data"], inp4["extents"], inp4["meta"],
        train=False,
    )

    @jax.jit
    def f4(p, data, extents, meta, n):
        def body(i, acc):
            out = model4.apply(p, data + acc * 1e-20, extents, meta, train=False)
            return (
                jnp.sum(out.hough.rois) * 1e-6 + jnp.sum(out.label_2d) * 1e-9
                + jnp.sum(out.poses_pred) * 1e-6
            ).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt4 = timed(f4, (params4, inp4["data"], inp4["extents"], inp4["meta"]), n1=5, n2=25)
    results["full_batch4_ms_per_image"] = round(dt4 * 1e3 / 4, 3)
    results["full_batch4_fps"] = round(4 / dt4, 1)
    print(json.dumps({"phase": "full_batch4", "ms_per_image": results["full_batch4_ms_per_image"],
                      "fps": results["full_batch4_fps"]}), flush=True)

    # c2f kernel tunings on realistic packed samples
    from posecnn_tpu.ops.hough_pallas import hough_votes_c2f
    from posecnn_tpu.ops.hough_voting import _prepare_slots

    rng = np.random.RandomState(0)
    label_np = np.zeros((h, w), np.int32)
    for cls, cx, cy, r in [(3, 200, 240, 60), (9, 450, 300, 45), (15, 320, 120, 50)]:
        ys, xs = np.mgrid[0:h, 0:w]
        label_np[(np.abs(xs - cx) < r) & (np.abs(ys - cy) < r)] = cls
    label = jnp.asarray(label_np[None])
    vert = jnp.asarray(rng.randn(1, h, w, 3 * c).astype(np.float32) * 0.3)
    prep = jax.jit(
        lambda l, v, e, m: _prepare_slots(
            l[0], v[0], e, m[0], num_classes=c, label_threshold=500,
            skip_pixels=10, num_samples=128, max_classes=8,
        )
    )(label, vert, inp["extents"], inp["meta"])
    packed = prep["packed"].reshape(8, 8, 128)
    bboxes = prep["bboxes"].reshape(8, 4)

    import functools

    @functools.partial(jax.jit, static_argnames=("coarse_factor", "top_t"))
    def g_c2f(packed, bboxes, n, coarse_factor, top_t):
        def body(i, acc):
            v, d, cy, cx = hough_votes_c2f(
                packed + acc * 1e-20, bboxes,
                cell_stride=1, grid_h=h, grid_w=w,
                coarse_factor=coarse_factor, top_t=top_t,
            )
            return (jnp.sum(v) * 1e-6 + jnp.sum(cy) * 1e-9).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for name, kw in [
        ("c2f_default_f4_t4", dict(coarse_factor=4, top_t=4)),
        ("c2f_f8_t4", dict(coarse_factor=8, top_t=4)),
        ("c2f_f4_t2", dict(coarse_factor=4, top_t=2)),
        ("c2f_f8_t2", dict(coarse_factor=8, top_t=2)),
    ]:
        def f_c2f(packed, bboxes, n, kw=kw):
            return g_c2f(packed, bboxes, n, **kw)

        dt = timed(f_c2f, (packed, bboxes))
        results[name] = round(dt * 1e3, 3)
        print(json.dumps({"phase": name, "ms": results[name]}), flush=True)

    os.makedirs("output", exist_ok=True)
    with open("output/bench_graph_phases.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"wrote": "output/bench_graph_phases.json"}))


if __name__ == "__main__":
    main()
