"""Train-step cost decomposition on one TPU chip (ablation differencing).

The tunnel hides async dispatch, so every variant is timed with the
in-jit fori_loop + host-fetch protocol of bench_train.py (median of 3
differenced pairs). Variants ablate whole graph branches; pairwise
differences attribute the 480×640 / 22-class / batch-2 step cost:

  full            — seg + vertex + Hough + RoI/fc4096 pose head + ADD
  no_pose         — seg + vertex only (drops Hough, RoI pool, fc, ADD)
  seg_only        — trunk + seg head
  add_p128        — full, ADD loss on 128 points instead of 512
  fc1024          — full, fc6/fc7 width 1024 instead of 4096
  res_240x320     — full at half resolution (4× fewer pixels)
  batch1          — full at batch 1

  pose branch  = full − no_pose
  vertex branch= no_pose − seg_only
  ADD points   = full − add_p128
  fc width     = full − fc1024
  pixel-scaling = full vs res_240x320 (per-pixel work vs fixed
                  optimizer/fc/ADD cost), full vs batch1 likewise

Run detached (compiles ~minutes per variant over the tunnel):
  setsid nohup python experiments/bench_train_components.py \
      > /tmp/bench_train_components.log 2>&1 &
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
    rng = np.random.RandomState(0)
    points512 = (rng.rand(c, 512, 3).astype(np.float32) - 0.5) * 0.12
    points512[0] = 0
    extents = np.abs(points512).max(1) * 2
    symmetry = np.zeros(c, np.float32)
    k = np.array([[1066.778, 0, w / 2], [0, 1067.487, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(points512, extents, k, width=w, height=h)
    ext = jnp.asarray(extents)
    sym = jnp.asarray(symmetry)

    def measure(name, *, vertex_reg=True, pose_reg=True, n_points=512, fc_dim=4096,
                res=None, batch=None, max_objects=2, max_pose_rois=0):
        bm = batch or b
        if res is not None:
            hm, wm = res
            km = np.array(
                [[1066.778 / 2, 0, wm / 2], [0, 1067.487 / 2, hm / 2], [0, 0, 1]],
                np.float32,
            )
            gen_m = SyntheticSceneGenerator(points512, extents, km, width=wm, height=hm)
        else:
            gen_m = gen
        cfg = cfg_from_dict(
            {
                "train": {
                    "num_classes": c,
                    "vertex_reg_2d": vertex_reg,
                    "pose_reg": pose_reg,
                    "ims_per_batch": bm,
                    "hough_num_samples": 128,
                    "max_rois": 36,
                    "add_num_points": n_points,
                    "fc_dim": fc_dim,
                }
            }
        )
        model = PoseCNN(
            num_classes=c, num_units=64, fc_dim=fc_dim, hough_num_samples=128,
            max_objects=max_objects, hough_cell_stride=1, vote_threshold=-1.0,
            vertex_reg=vertex_reg, pose_reg=pose_reg,
            max_pose_rois=max_pose_rois,
        )
        pts = jnp.asarray(points512[:, :n_points])
        gen_m.rng = np.random.RandomState(0)
        batch_np = gen_m.minibatch(bm, dense_vertex_targets=False)
        if not vertex_reg:
            batch_np = {
                key: v for key, v in batch_np.items()
                if key in ("data", "label", "meta", "gt_poses", "gt_valid")
            }
        batch = {key: jnp.asarray(v) for key, v in batch_np.items()}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, ext)
        tx = create_optimizer(cfg, state.params)

        @jax.jit
        def run(state, batch, key, n):
            def body(i, carry):
                st, acc = carry

                def loss_fn(p):
                    total, _ = compute_losses(
                        model, p, {**batch, "data": batch["data"] + acc * 1e-20},
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
        float(run(*args, 1))
        n1, n2 = 3, 23
        float(run(*args, n1))
        float(run(*args, n2))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(*args, n1)); d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(*args, n2)); d2 = time.perf_counter() - t0
            samples.append((d2 - d1) / (n2 - n1))
        samples.sort()
        ms = samples[1] * 1e3
        print(f"{name}: {ms:.2f} ms/iter", flush=True)
        return ms

    out = {}
    out["full"] = measure("full")
    # flagship-row-count variants: the training CLI sizes max_objects
    # so R = B·M·9 = 126 (max_rois=128); rows_126 is therefore the
    # cost the real train step pays, and compact64 the same graph
    # with the static top-64-by-validity pose-row compaction
    out["rows_126"] = measure("rows_126", max_objects=7)
    out["rows_126_compact64"] = measure(
        "rows_126_compact64", max_objects=7, max_pose_rois=64
    )
    out["no_pose"] = measure("no_pose", pose_reg=False)
    out["seg_only"] = measure("seg_only", vertex_reg=False, pose_reg=False)
    out["add_p128"] = measure("add_p128", n_points=128)
    out["fc1024"] = measure("fc1024", fc_dim=1024)
    out["res_240x320"] = measure("res_240x320", res=(240, 320))
    out["batch1"] = measure("batch1", batch=1)
    out["pose_branch_ms"] = round(out["full"] - out["no_pose"], 2)
    out["vertex_branch_ms"] = round(out["no_pose"] - out["seg_only"], 2)
    out["add_points_ms"] = round(out["full"] - out["add_p128"], 2)
    out["fc_width_ms"] = round(out["full"] - out["fc1024"], 2)
    out["fixed_cost_est_ms"] = round((4 * out["res_240x320"] - out["full"]) / 3, 2)
    out["compaction_saves_ms"] = round(out["rows_126"] - out["rows_126_compact64"], 2)
    print(json.dumps({k_: round(v, 2) for k_, v in out.items()}))


if __name__ == "__main__":
    main()
