"""Data-parallel scaling harness (BASELINE.md target: ≥85% train-step
scaling efficiency 1 host → N hosts).

Weak scaling: per-device batch fixed, global batch = N·b. On real
hardware run one process per host (jax.distributed.initialize via
parallel/mesh.multihost_init) and this script reports images/s and
efficiency vs the 1-device run. In THIS environment only one real TPU
chip exists, so the default runs on N virtual CPU devices
(--xla_force_host_platform_device_count) — that validates the
sharding/measurement mechanism, NOT absolute scaling (virtual devices
share one host's cores; expect <100% "efficiency" here).

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python experiments/bench_scaling.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from posecnn_tpu.core.config import cfg_from_dict
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import create_train_state, make_train_step
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.parallel.mesh import batch_sharding, create_mesh, replicated

    n_dev_all = len(jax.devices())
    c, h, w, per_dev_b, p_pts = 6, 96, 128, 1, 64
    rng = np.random.RandomState(0)
    points = (rng.rand(c, p_pts, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    symmetry = np.zeros(c, np.float32)
    k = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, min_objects=1, max_objects=2,
        t_near=0.6, t_far=1.2, seed=3,
    )

    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev_all]
    for n in sizes:
        b = per_dev_b * n
        cfg = cfg_from_dict(
            {
                "train": {
                    "num_classes": c, "vertex_reg_2d": True, "pose_reg": True,
                    "ims_per_batch": b, "hough_num_samples": 32,
                    "max_rois": 4 * b, "add_num_points": p_pts,
                },
                "parallel": {"num_data": n},
            }
        )
        model = PoseCNN(
            num_classes=c, num_units=16, fc_dim=64, hough_num_samples=32,
            max_objects=2, hough_cell_stride=2, compute_dtype=jnp.float32,
        )
        mesh = create_mesh(num_data=n)
        bs, rep = batch_sharding(mesh), replicated(mesh)
        gen.rng = np.random.RandomState(1)
        batch_np = gen.minibatch(b, dense_vertex_targets=False)
        batch = {
            key: jax.device_put(
                jnp.asarray(v), rep if key in ("gt_poses", "gt_valid") else bs
            )
            for key, v in batch_np.items()
        }
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), batch, jnp.asarray(extents)
        )
        state = jax.device_put(state, rep)
        step = make_train_step(
            cfg, model, jnp.asarray(points), jnp.asarray(extents),
            jnp.asarray(symmetry), mesh=mesh, donate=False,
        )
        rngk = jax.random.PRNGKey(0)
        state, m = step(state, batch, rngk)  # compile
        jax.block_until_ready(m["loss"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rngk)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        results[n] = {"s_per_iter": dt, "images_per_s": b / dt}
        print(json.dumps({"devices": n, **{k2: round(v, 4) for k2, v in results[n].items()}}), flush=True)

    if 1 in results:
        base = results[1]["images_per_s"]
        for n in sizes[1:]:
            eff = results[n]["images_per_s"] / (base * n)
            print(json.dumps({"devices": n, "weak_scaling_efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
