"""Two-process `jax.distributed` bring-up exercise (CPU backend).

SURVEY.md §2.4 / BASELINE.md name multi-host DP as a target, but this
environment has a single TPU chip — so the multi-process mechanics are
exercised with TWO LOCAL CPU PROCESSES forming one JAX runtime:

  * `jax.distributed.initialize` via parallel/mesh.initialize_distributed
    (coordinator on localhost, process_id 0/1);
  * the host-sharded data path: each process's ShuffledIndexer walks a
    DISJOINT half of the epoch (data/pipeline.py:47-63);
  * one global 2-device mesh over both processes' CPU devices; batch
    arrays assembled with jax.make_array_from_process_local_data, the
    REAL make_train_step jitted over the mesh, gradients psum'd by XLA
    across the process boundary;
  * both processes must report the identical (fully-replicated) loss.

Run (parent spawns the two children and validates their output):
  python experiments/dist_2proc.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 52761
NUM_PROC = 2


def child(proc_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from posecnn_tpu.core.config import cfg_from_dict
    from posecnn_tpu.data.pipeline import ShuffledIndexer
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import TrainState, create_optimizer, make_train_step
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.parallel.mesh import create_mesh, initialize_distributed

    pidx, pcount = initialize_distributed(
        f"127.0.0.1:{PORT}", NUM_PROC, proc_id
    )
    assert pcount == NUM_PROC, f"process_count {pcount} != {NUM_PROC}"
    assert pidx == proc_id

    # host-sharded indexer: each process sees a disjoint half-epoch
    idx = ShuffledIndexer(8, seed=0, process_index=pidx, process_count=pcount)
    my_indices = sorted(int(i) for i in idx.next_batch(4))
    print(json.dumps({"proc": pidx, "epoch_shard": my_indices}), flush=True)

    c, h, w, p_pts = 4, 48, 64, 32
    rng_np = np.random.RandomState(0)
    points = (rng_np.rand(c, p_pts, 3).astype(np.float32) - 0.5) * 0.1
    points[0] = 0
    extents = np.abs(points).max(1) * 2
    symmetry = np.zeros(c, np.float32)
    k = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], np.float32)

    cfg = cfg_from_dict(
        {
            "train": {
                "num_classes": c, "vertex_reg_2d": True, "pose_reg": True,
                "ims_per_batch": NUM_PROC, "hough_num_samples": 32,
                "max_rois": 4 * NUM_PROC, "add_num_points": p_pts,
            },
            "parallel": {"num_data": NUM_PROC},
        }
    )
    model = PoseCNN(
        num_classes=c, num_units=8, fc_dim=32, hough_num_samples=32,
        max_objects=2, hough_cell_stride=2, compute_dtype=jnp.float32,
    )
    mesh = create_mesh(num_data=NUM_PROC)
    bs = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # per-process LOCAL batch (different data per host, as in real DP),
    # assembled into global arrays
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, min_objects=1, max_objects=1,
        t_near=0.5, t_far=0.9, seed=100 + pidx,
    )
    local = gen.minibatch(1, max_gt=2, dense_vertex_targets=False)

    def to_global(key, v):
        v = jnp.asarray(v)
        if key in ("gt_poses", "gt_valid"):
            # replicated: every process must supply identical values —
            # gather both halves' GT via the deterministic seeds
            g0 = SyntheticSceneGenerator(
                points, extents, k, width=w, height=h, min_objects=1,
                max_objects=1, t_near=0.5, t_far=0.9, seed=100,
            ).minibatch(1, max_gt=2, dense_vertex_targets=False)
            g1 = SyntheticSceneGenerator(
                points, extents, k, width=w, height=h, min_objects=1,
                max_objects=1, t_near=0.5, t_far=0.9, seed=101,
            ).minibatch(1, max_gt=2, dense_vertex_targets=False)
            both = np.concatenate([g0[key], g1[key]])
            if key == "gt_poses":
                both[2:, 0] = 1  # second image's GT rows → batch id 1
            return jax.device_put(jnp.asarray(both), rep)
        shard_shape = (NUM_PROC,) + v.shape[1:]
        return jax.make_array_from_process_local_data(bs, np.asarray(v), shard_shape)

    batch = {key: to_global(key, v) for key, v in local.items()}

    # state built INSIDE jit so global arrays never hit eager ops
    def init_state(rng):
        params = model.init(
            rng, batch["data"], jnp.asarray(extents), batch["meta"],
            batch.get("gt_poses"), batch.get("gt_valid"), train=False,
        )
        opt_state = create_optimizer(cfg, params).init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    with mesh:
        state = jax.jit(init_state, out_shardings=rep)(jax.random.PRNGKey(0))
    step = make_train_step(
        cfg, model, jnp.asarray(points), jnp.asarray(extents),
        jnp.asarray(symmetry), mesh=mesh, donate=False,
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, rng)
        losses.append(float(jax.device_get(metrics["loss"])))
    print(json.dumps({"proc": pidx, "losses": losses}), flush=True)
    assert all(np.isfinite(losses)), f"non-finite loss {losses}"


def main() -> int:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    # the axon sitecustomize eagerly initializes the tunneled PJRT
    # backend at interpreter start, which breaks the "initialize()
    # before any JAX call" contract — disable it for the children
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    for i in range(NUM_PROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(i)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    t0 = time.time()
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    ok = all(p.returncode == 0 for p in procs)
    shards, losses = {}, {}
    for out in outs:
        for line in out.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "epoch_shard" in rec:
                shards[rec["proc"]] = rec["epoch_shard"]
            if "losses" in rec:
                losses[rec["proc"]] = rec["losses"]
    disjoint = (
        len(shards) == 2 and not set(shards[0]) & set(shards[1])
    )
    agree = len(losses) == 2 and losses[0] == losses[1]
    result = {
        "metric": "dist_2proc", "unit": "pass",
        "value": int(ok and disjoint and agree),
        "exit_ok": ok, "shards_disjoint": disjoint,
        "losses_agree": agree, "shards": shards, "losses": losses,
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if not result["value"]:
        for i, out in enumerate(outs):
            sys.stderr.write(f"--- proc {i} output ---\n{out}\n")
    return 0 if result["value"] else 1


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
    else:
        sys.exit(main())
