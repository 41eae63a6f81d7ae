"""Training-step device throughput on one TPU chip.

The tunnel's async dispatch makes host-side s/iter meaningless
(CLAUDE.md), so the whole measurement runs on-device: a jitted
fori_loop carries TrainState through N real train steps on a fixed
batch (data perturbed per-iteration by the running loss to defeat
CSE), synced by fetching the final loss. Loop overhead removed by
two-point differencing. Reference config: 480×640, 22 classes,
batch 2, full fc4096 (ref: experiments/cfgs/lov_color_2d.yml,
train s/iter printed at lib/fcn/train.py:131-135).

Run detached:
  setsid nohup python experiments/bench_train.py > /tmp/bench_train.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/posecnn_jax_cache")
    import jax.numpy as jnp
    import optax

    from posecnn_tpu.core.config import cfg_from_dict
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import (
        TrainState,
        compute_losses,
        create_optimizer,
        create_train_state,
    )
    from posecnn_tpu.models import PoseCNN

    c, h, w, b = 22, 480, 640, 2
    cfg = cfg_from_dict(
        {
            "train": {
                "num_classes": c,
                "vertex_reg_2d": True,
                "pose_reg": True,
                "ims_per_batch": b,
                "hough_num_samples": 128,
                "max_rois": 36,
                "add_num_points": 512,
            }
        }
    )
    rng = np.random.RandomState(0)
    points = (rng.rand(c, 512, 3).astype(np.float32) - 0.5) * 0.12
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    symmetry = np.zeros(c, np.float32)
    k = np.array([[1066.778, 0, w / 2], [0, 1067.487, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points, extents, k, width=w, height=h)

    model = PoseCNN(
        num_classes=c, num_units=64, hough_num_samples=128,
        max_objects=2, hough_cell_stride=1, vote_threshold=-1.0,
    )
    pts, ext, sym = jnp.asarray(points), jnp.asarray(extents), jnp.asarray(symmetry)

    def measure(dense):
        gen.rng = np.random.RandomState(0)
        batch_np = gen.minibatch(b, dense_vertex_targets=dense)
        batch = {key: jnp.asarray(v) for key, v in batch_np.items()}
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), batch, jnp.asarray(extents)
        )
        tx = create_optimizer(cfg, state.params)

        @jax.jit
        def run(state, batch, key, n):
            def body(i, carry):
                st, acc = carry

                def loss_fn(p):
                    total, _ = compute_losses(
                        model, p,
                        {**batch, "data": batch["data"] + acc * 1e-20},
                        cfg, pts, ext, sym,
                        dropout_rng=jax.random.fold_in(key, i),
                    )
                    return total

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return (TrainState(params, opt_state, st.step + 1), loss)

            final, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
            return loss

        args = (state, batch, jax.random.PRNGKey(1))
        float(run(*args, 1))  # compile + sync
        # tunnel timing is noisy (deferred transfers, dispatch jitter):
        # warm both call shapes, then take the median of 3 differenced
        # pairs
        n1, n2 = 3, 23
        float(run(*args, n1))
        float(run(*args, n2))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*args, n1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(*args, n2))
            t2 = time.perf_counter() - t0
            samples.append((t2 - t1) / (n2 - n1))
        samples.sort()
        return samples[1]

    # sparse = the flagship train contract (targets built on device by
    # compute_losses — ops/losses.build_vertex_targets); dense = the
    # host-built (H,W,3C) maps, for comparison
    dt_sparse = measure(dense=False)
    dt_dense = measure(dense=True)
    # headline = the flagship sparse contract (comparable round over
    # round; a sparse regression must show in the recorded series)
    print(
        json.dumps(
            {
                "metric": "posecnn_train_s_per_iter_480x640_b2_1chip",
                "value": round(dt_sparse, 4),
                "unit": "s/iter",
                "note": "device-only step time (fwd+bwd+update), fc4096, sparse vertex feed",
                "sparse_feed_s": round(dt_sparse, 4),
                "dense_feed_s": round(dt_dense, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
