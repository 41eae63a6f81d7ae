"""Component-level TPU timing for the PoseCNN inference graph.

Same protocol as bench.py (in-jit fori_loop with a data dependency,
host-fetch sync, two-point loop-overhead removal). Prints one JSON
line per component. Run detached:

  setsid nohup python experiments/bench_components.py > /tmp/bench_comp.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n1=5, n2=25):
    import jax

    float(fn(*args, 1))  # compile + sync
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
    from posecnn_tpu.models import PoseCNN, VGG16Trunk
    from posecnn_tpu.models.posecnn import PoseHead
    from posecnn_tpu.ops.hough_voting import hough_voting
    from posecnn_tpu.ops.roi_align import roi_pool_fused

    c, h, w = 22, 480, 640
    inp = _make_inputs(1, h, w, c)
    results = {}

    def report(name, dt):
        results[name] = dt * 1e3
        print(json.dumps({"component": name, "ms": round(dt * 1e3, 3)}), flush=True)

    # 1. trunk
    trunk = VGG16Trunk()
    tp = trunk.init(jax.random.PRNGKey(0), inp["data"])

    @jax.jit
    def f_trunk(p, data, n):
        def body(i, acc):
            c4, c5 = trunk.apply(p, data + acc * 1e-20)
            return (jnp.sum(c5) * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    report("trunk", timed(f_trunk, (tp, inp["data"])))

    # 2/3/4. model variants
    for name, kwargs in [
        ("seg_only", dict(vertex_reg=False, pose_reg=False)),
        ("seg_vertex_hough", dict(vertex_reg=True, pose_reg=False)),
        ("full", dict(vertex_reg=True, pose_reg=True)),
    ]:
        model = PoseCNN(
            num_classes=c, num_units=64, hough_num_samples=128, max_objects=8,
            hough_cell_stride=1, vote_threshold=-1.0, **kwargs,
        )
        params = model.init(
            jax.random.PRNGKey(0), inp["data"], inp["extents"], inp["meta"], train=False
        )

        @jax.jit
        def f(p, data, extents, meta, n, model=model):
            def body(i, acc):
                out = model.apply(p, data + acc * 1e-20, extents, meta, train=False)
                s = jnp.sum(out.label_2d) * 1e-9
                if out.hough is not None:
                    s = s + jnp.sum(out.hough.rois) * 1e-6
                if out.poses_pred is not None:
                    s = s + jnp.sum(out.poses_pred) * 1e-6
                return s.astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        report(name, timed(f, (params, inp["data"], inp["extents"], inp["meta"])))

    # 5. hough alone on random label/vertex
    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.randint(0, c, (1, h, w)), jnp.int32)
    vert = jnp.asarray(rng.randn(1, h, w, 3 * c).astype(np.float32) * 0.3)

    @jax.jit
    def f_hough(label, vert, extents, meta, n):
        def body(i, acc):
            out = hough_voting(
                label, vert + acc * 1e-20, extents, meta,
                is_train=False, vote_threshold=-1.0, num_samples=128,
                max_objects_per_image=8, cell_stride=1,
            )
            return (jnp.sum(out.rois) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    report("hough_alone", timed(f_hough, (label, vert, inp["extents"], inp["meta"])))

    # 6. roi pool + pose head alone
    c4 = jnp.asarray(rng.randn(1, h // 8, w // 8, 512).astype(np.float32))
    c5 = jnp.asarray(rng.randn(1, h // 16, w // 16, 512).astype(np.float32))
    rois = jnp.asarray(
        np.stack([
            np.zeros(8), np.arange(1, 9),
            rng.uniform(0, w / 2, 8), rng.uniform(0, h / 2, 8),
            rng.uniform(w / 2, w, 8), rng.uniform(h / 2, h, 8),
            np.ones(8),
        ], axis=1).astype(np.float32)
    )
    head = PoseHead(num_classes=c)
    pooled0 = roi_pool_fused(c4, c5, rois)
    pw = jnp.zeros((8, 4 * c), jnp.float32).at[:, :4].set(1.0)
    hp = head.init(jax.random.PRNGKey(0), pooled0, pw, train=False)

    @jax.jit
    def f_head(hp, c4, c5, rois, pw, n):
        def body(i, acc):
            pooled = roi_pool_fused(c4 + acc * 1e-20, c5, rois)
            pp, _ = head.apply(hp, pooled, pw, train=False)
            return (jnp.sum(pp) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    report("roi_posehead_alone", timed(f_head, (hp, c4, c5, rois, pw)))

    print(json.dumps({"summary_ms": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
