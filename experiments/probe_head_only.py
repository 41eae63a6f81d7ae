"""Head-only rotation probe: can fc6/fc7/fc8 learn rotation from the
CURRENT trunk's features?

Round-3 discriminator for the rotation plateau (oracle eval at 16k
iters reads ~132 deg mean on GT RoIs even with dense weight-1 GT
supervision, while the r2 logit-level probe proved the ADD loss path
itself converges). Two remaining hypotheses:

  H1 joint-training dynamics: trunk features DO carry orientation, but
     the pose gradient (pose_w=1) is drowned by seg+vertex (1+5) and
     dropout noise -> head-only training on a frozen trunk converges.
  H2 feature insufficiency: a from-scratch trunk trained mostly by
     orientation-invariant objectives (seg, center-direction vertex)
     never builds orientation-selective features -> head-only training
     stalls at the same plateau.

This script freezes everything except the pose head, trains it on
injected GT RoIs (ops/hough_voting.append_gt_rois path, keep_prob=1)
with the exact scaled hinged ADD loss the train step uses, and
reports the on-batch rotation error trajectory. Reference: the
reference never needed this probe because it starts from ImageNet
VGG16 features (lib/networks/network.py:71-107 loader).
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
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="output/r3_head_probe.json")
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import optax

    from posecnn_tpu.core.checkpoint import restore_params
    from posecnn_tpu.core.config import cfg_from_file
    from posecnn_tpu.data.datasets import YCBVideoDataset
    from posecnn_tpu.data.procedural import colorize_model_library
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import loss_point_scale
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.ops.add_loss import average_distance_loss
    from posecnn_tpu.utils.quaternion import quat_to_mat

    cfg = cfg_from_file(args.cfg)
    ds = YCBVideoDataset(args.data_root, "train")
    c = ds.num_classes
    points_full, extents = ds.points, ds.extents
    symmetry = np.asarray(ds.symmetry, np.float32)
    point_colors, point_normals = colorize_model_library(points_full)
    width, height = cfg.train.syn_width, cfg.train.syn_height
    k = np.array(
        [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32
    )
    gen = SyntheticSceneGenerator(
        points_full, extents, k, width=width, height=height,
        t_near=cfg.train.syn_tnear, t_far=cfg.train.syn_tfar,
        pixel_means=cfg.pixel_means, seed=args.seed,
        point_colors=point_colors, point_normals=point_normals,
    )
    idxp = np.linspace(0, points_full.shape[1] - 1, cfg.train.add_num_points).astype(int)
    ext_j = jnp.asarray(extents)
    pts_s, sym_eff = loss_point_scale(
        jnp.asarray(points_full[:, idxp]), ext_j, jnp.asarray(symmetry),
        jnp.asarray(True),
    )

    model = PoseCNN(
        num_classes=c, num_units=cfg.train.num_units, fc_dim=cfg.train.fc_dim,
        pose_pool_size=cfg.train.pose_pool_size,
        compute_dtype=jnp.dtype(cfg.compute_dtype), vertex_reg=True,
        pose_reg=True, hough_num_samples=cfg.train.hough_num_samples,
        max_objects=7, gt_pose_rois=True,
    )
    b0 = gen.minibatch(args.batch, dense_vertex_targets=False)
    n_gt = b0["gt_poses"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b0["data"]), ext_j,
        jnp.asarray(b0["meta"]), gt_poses=jnp.asarray(b0["gt_poses"]),
        gt_valid=jnp.asarray(b0["gt_valid"]), train=True, keep_prob=1.0,
    )
    params, step0 = restore_params(args.ckpt, params)
    print(f"restored checkpoint at step {step0}", flush=True)

    top = dict(params["params"])
    head = top.pop("pose_head")
    frozen = jax.tree_util.tree_map(jnp.asarray, top)

    tx = optax.adam(args.lr)
    opt_state = tx.init(head)

    def forward(head_p, batch):
        p = {"params": {**frozen, "pose_head": head_p}}
        out = model.apply(
            p, batch["data"], ext_j, batch["meta"],
            gt_poses=batch["gt_poses"], gt_valid=batch["gt_valid"],
            train=True, keep_prob=1.0,
        )
        return out

    @jax.jit
    def train_step(head_p, opt_state, batch):
        def loss_fn(hp):
            out = forward(hp, batch)
            # supervise ONLY the injected GT rows (first n_gt): exact
            # boxes, weight-1 targets — the cleanest signal
            preds = out.poses_pred[:n_gt]
            tgts = out.hough.poses_target[:n_gt]
            wts = out.hough.poses_weight[:n_gt]
            nv = jnp.maximum(jnp.sum(out.hough.valid[:n_gt].astype(jnp.float32)), 1.0)
            return average_distance_loss(
                preds, tgts, wts, pts_s, sym_eff, margin=0.01, num_valid=nv
            ), preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(head_p)
        updates, opt_state = tx.update(grads, opt_state, head_p)
        head_p = optax.apply_updates(head_p, updates)
        return head_p, opt_state, loss, preds

    def rot_errs(preds, batch):
        errs = []
        gt = np.asarray(batch["gt_poses"])
        gv = np.asarray(batch["gt_valid"])
        for i in range(n_gt):
            if not gv[i]:
                continue
            cls = int(gt[i, 1])
            if symmetry[cls] > 0:
                continue
            q = np.asarray(preds[i, 4 * cls : 4 * cls + 4])
            nn_ = np.linalg.norm(q)
            if nn_ < 1e-6:
                continue
            r_p = np.asarray(quat_to_mat(jnp.asarray(q / nn_)))
            r_g = np.asarray(quat_to_mat(jnp.asarray(gt[i, 6:10])))
            cos = np.clip((np.trace(r_p.T @ r_g) - 1) / 2, -1, 1)
            errs.append(float(np.degrees(np.arccos(cos))))
        return errs

    hist = []
    for it in range(args.steps):
        batch_np = gen.minibatch(args.batch, dense_vertex_targets=False)
        batch = {
            key: jnp.asarray(batch_np[key])
            for key in ("data", "meta", "gt_poses", "gt_valid")
        }
        head, opt_state, loss, preds = train_step(head, opt_state, batch)
        if it % 100 == 0 or it == args.steps - 1:
            errs = rot_errs(np.asarray(preds), batch_np)
            e = round(float(np.mean(errs)), 1) if errs else None
            hist.append({"it": it, "loss": round(float(loss), 4), "rot_deg": e})
            print(f"it {it}: loss {float(loss):.4f} rot_mean_deg {e}", flush=True)

    summary = {
        "metric": "head_only_probe",
        "ckpt_step": int(step0),
        "steps": args.steps,
        "lr": args.lr,
        "history": hist,
        "final_rot_deg": hist[-1]["rot_deg"] if hist else None,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "history"}))


if __name__ == "__main__":
    main()
