"""Pose-gradient scale probe (round-4 diagnosis).

Observation: with the r3-fixed ADD gradient and GT-RoI injection, the
oracle rotation error stays at chance (~141 deg) through 4k iters while
loss_pose reads 0.07-0.29 — but average_distance_loss normalizes by
num_valid = ALL valid rois (~91) while only the GT-matched/injected
rows (~10) carry weight, so the low reading is dilution, not learning
(random-rotation calibration: per-weighted-row ADD ~= 0.66).

This probe quantifies the actual training signal with the REAL loss
composition (engine/train.compute_losses) at a reduced synthetic
resolution (params are resolution-agnostic: FCN trunk + 7x7 RoI pool):
per-parameter-group gradient norms, the weighted-row census, and the
pose loss re-normalized by weighted rows — the decisive numbers for
whether the pose head's training signal is orders of magnitude below
the trunk's.

Usage: python experiments/probe_pose_grad.py --ckpt <snap.npz>
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_root", default="/root/reference/data/LOV")
    ap.add_argument("--cfg", default="experiments/cfgs/lov_color_2d.yaml")
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from posecnn_tpu.core.checkpoint import restore_params
    from posecnn_tpu.core.config import cfg_from_file
    from posecnn_tpu.data.datasets import YCBVideoDataset
    from posecnn_tpu.data.procedural import colorize_model_library
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import compute_losses, loss_point_scale
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.ops.add_loss import average_distance_loss

    cfg = cfg_from_file(args.cfg)
    ds = YCBVideoDataset(args.data_root, "train")
    c = ds.num_classes
    points, extents, symmetry = ds.points, ds.extents, ds.symmetry
    point_colors, point_normals = colorize_model_library(points)
    k = np.array(
        [[1066.778 / 2, 0, args.width / 2], [0, 1067.487 / 2, args.height / 2], [0, 0, 1]],
        np.float32,
    )
    gen = SyntheticSceneGenerator(
        points, extents, k, width=args.width, height=args.height,
        t_near=cfg.train.syn_tnear, t_far=cfg.train.syn_tfar,
        pixel_means=cfg.pixel_means, seed=args.seed,
        point_colors=point_colors, point_normals=point_normals,
    )
    bsz = cfg.train.ims_per_batch
    model = PoseCNN(
        num_classes=c,
        num_units=cfg.train.num_units,
        fc_dim=cfg.train.fc_dim,
        pose_pool_size=cfg.train.pose_pool_size,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        vertex_reg=True,
        pose_reg=True,
        threshold_label=cfg.train.threshold_label,
        vote_threshold=cfg.train.voting_threshold,
        hough_num_samples=cfg.train.hough_num_samples,
        max_objects=max(1, cfg.train.max_rois // max(bsz, 1) // 9),
        max_pose_rois=cfg.train.max_pose_rois,
        gt_pose_rois=True,
    )
    batch = gen.minibatch(bsz, dense_vertex_targets=False)
    tb = {kk: jnp.asarray(v) for kk, v in batch.items() if not kk.startswith("_")}
    params = model.init(
        jax.random.PRNGKey(0), tb["data"], jnp.asarray(extents), tb["meta"],
        tb.get("gt_poses"), tb.get("gt_valid"), train=False,
    )
    params, step0 = restore_params(args.ckpt, params)
    print(f"restored ckpt step {step0}", flush=True)

    is_sym = jnp.asarray(True)
    pts_eff, sym_eff = loss_point_scale(points, extents, symmetry, is_sym)

    def loss_fn(p):
        return compute_losses(
            model, p, tb, cfg, pts_eff, jnp.asarray(extents), sym_eff,
            dropout_rng=jax.random.PRNGKey(7),
        )

    (total, metrics), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    groups = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = "/".join(str(getattr(p, "key", "")) for p in path)
        top = (
            "pose_head" if "pose_head" in name
            else "vertex_head" if "vertex" in name
            else "seg_head" if "score" in name or "seg" in name
            else "trunk"
        )
        groups[top] = groups.get(top, 0.0) + float(jnp.sum(leaf.astype(jnp.float32) ** 2))

    # weighted-row census + undiluted pose loss from a fresh forward
    out = model.apply(
        params, tb["data"], jnp.asarray(extents), tb["meta"],
        tb.get("gt_poses"), tb.get("gt_valid"), train=True, keep_prob=1.0,
    )
    w = np.asarray(out.hough.poses_weight)
    valid = np.asarray(out.hough.valid)
    weighted = (w.reshape(w.shape[0], -1).max(1) > 0) & valid
    n_weighted = int(weighted.sum())
    n_valid = int(valid.sum())
    undiluted = average_distance_loss(
        out.poses_pred, out.hough.poses_target, out.hough.poses_weight,
        pts_eff, sym_eff, num_valid=jnp.asarray(max(n_weighted, 1), jnp.float32),
    )
    rec = {
        "ckpt_step": int(step0),
        "grad_norms": {g: float(np.sqrt(v)) for g, v in sorted(groups.items())},
        "metrics": {m: round(float(v), 4) for m, v in metrics.items()},
        "n_valid_rois": n_valid,
        "n_weighted_rois": n_weighted,
        "loss_pose_per_weighted_row": round(float(undiluted), 4),
        "random_level_calibration": 0.66,
    }
    print(json.dumps(rec, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
