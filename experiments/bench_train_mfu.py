"""Device-only train-step time + MFU at the flagship operating points.

r4 verdict task 5: the 7.7% MFU figure in train_profile.json was
measured WITH a host sync per iteration over the axon tunnel, which
deflates it (the same pitfall bench.py's fori_loop protocol exists to
avoid). This bench re-measures honestly: N real train steps run inside
ONE jitted fori_loop on a resident batch (no host feed at all), timed
by fetching the final loss, differenced across two N to remove loop
overhead — so the number is pure device fwd+bwd+update throughput.
MFU = XLA cost-analysis FLOPs / step-time / 197 TFLOP/s (v5e bf16).

Points measured (batch, scale): the r5/r6 flagship recipe (8, 0.5),
the reference-resolution fine-tune (8, 1.0), and the task-5 probe
(16, 1.0). Host-feed overlap is measured separately by comparing the
chunked trainer's wall s/iter (metrics.jsonl) against this device
floor: wall ≈ device ⇒ the Prefetcher hides host render + transfer.

Run detached (chip must be otherwise idle for honest numbers):
  setsid nohup python experiments/bench_train_mfu.py \
      > experiments/logs/bench_train_mfu.log 2>&1 &

Ref framing: the train hot loop is the product (lib/fcn/train.py:240);
the reference prints host s/iter at train.py:131-135.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # TPU v5e bf16 peak per chip


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

    c = 22
    results = []
    for b, scale in [(8, 0.5), (8, 1.0), (16, 1.0)]:
        h, w = int(480 * scale), int(640 * scale)
        cfg = cfg_from_dict(
            {
                "train": {
                    "num_classes": c,
                    "vertex_reg_2d": True,
                    "pose_reg": True,
                    "ims_per_batch": b,
                    "hough_num_samples": 128,
                    "max_rois": 16 * b,
                    "add_num_points": 512,
                    "gt_pose_rois": True,
                    "optimizer": "adam",
                    "grad_clip": 35.0,
                }
            }
        )
        rng = np.random.RandomState(0)
        points = (rng.rand(c, 512, 3).astype(np.float32) - 0.5) * 0.12
        points[0] = 0
        extents = np.abs(points).max(1) * 2
        symmetry = np.zeros(c, np.float32)
        k = np.array(
            [[1066.778 * scale, 0, w / 2], [0, 1067.487 * scale, h / 2], [0, 0, 1]],
            np.float32,
        )
        gen = SyntheticSceneGenerator(points, extents, k, width=w, height=h)
        model = PoseCNN(
            num_classes=c, num_units=64, hough_num_samples=128,
            max_objects=max(1, 16 * b // max(b, 1) // 9), hough_cell_stride=1,
            vote_threshold=-1.0, gt_pose_rois=True,
        )
        pts, ext, sym = jnp.asarray(points), jnp.asarray(extents), jnp.asarray(symmetry)
        batch_np = gen.minibatch(b, max_gt=8 * b, dense_vertex_targets=False)
        batch = {key: jnp.asarray(v) for key, v in batch_np.items()}
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, ext)
        tx = create_optimizer(cfg, state.params)

        def make_run(model=model, cfg=cfg, tx=tx, batch=batch, pts=pts, ext=ext, sym=sym):
            @jax.jit
            def run(state, key, n):
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

            return run

        run = make_run()
        args = (state, jax.random.PRNGKey(1))
        t0 = time.perf_counter()
        float(run(*args, 1))
        compile_s = time.perf_counter() - t0
        # FLOPs of ONE step: cost_analysis of the n-step program scales
        # with n; difference two counts to drop the setup
        try:
            c1 = jax.jit(run).lower(*args, 1).compile().cost_analysis()
            c2 = jax.jit(run).lower(*args, 3).compile().cost_analysis()
            flops = (float(c2.get("flops", 0)) - float(c1.get("flops", 0))) / 2.0
        except Exception as e:  # noqa: BLE001
            print(f"cost_analysis unavailable: {e}", flush=True)
            flops = 0.0
        n1, n2 = 3, 13
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
        dt = samples[1]
        achieved = flops / dt / 1e12 if flops and dt else None
        row = {
            "batch": b,
            "scale": scale,
            "hw": [h, w],
            "device_s_per_iter": round(dt, 4),
            "samples_per_s": round(b / dt, 1),
            "step_flops": flops,
            "achieved_tflops": round(achieved, 2) if achieved else None,
            "mfu_pct": round(100 * achieved / PEAK_TFLOPS, 1) if achieved else None,
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {"metric": "train_mfu_sweep", "points": results}
    os.makedirs("output", exist_ok=True)
    with open("output/bench_train_mfu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"wrote": "output/bench_train_mfu.json"}))


if __name__ == "__main__":
    main()
