"""Oracle rotation eval: quaternion-head quality on GT RoIs.

The end-to-end eval (cli/test_net) conditions pose metrics on Hough
DETECTIONS, so early in training (before the seg inflection) ADD AUC
is ~0 regardless of how well the quaternion head has learned rotation.
This probe decouples the two: it runs the trained trunk + pose head on
held-out synthetic scenes with the pose head fed EXACT GT RoIs (the
same `append_gt_rois` path the train step uses, eval-deterministic
with keep_prob=1), and reports per-class geodesic rotation error of
the predicted quaternion vs GT — the direct measure of VERDICT r2
task 1's "does the head learn rotation".

Reference for the rotation-error metric: lib/utils/pose_error.py:92-106
(re); the reference has no oracle-RoI evaluation (its pose head is only
reachable through hough emission, vgg16_convs.py:167-200).

Usage:
  python experiments/eval_rotation_oracle.py --ckpt <snap.npz> \
      --num_images 20 --seed 4242 [--out output/r3_rot_oracle.json]
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
    ap.add_argument("--num_images", type=int, default=20)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--out", default="output/r3_rot_oracle.json")
    ap.add_argument("--device", default=None)
    ap.add_argument(
        "--scale", type=float, default=1.0,
        help="evaluate at scale×(syn_width, syn_height) with k scaled "
        "to match — set to the training TRAIN.SCALES_BASE to measure "
        "at the trained feature scale (the half-scale r5p flagship "
        "sees 2× coarser features at full-res eval)",
    )
    ap.add_argument(
        "--backgrounds", default="output/bg_pool/*.png",
        help="compositing pool — keep it the SAME pool training used "
        "so oracle features see the train distribution (r4 oracles ran "
        "on background-free scenes while training composited); empty "
        "disables",
    )
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
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.utils.quaternion import quat_to_mat

    cfg = cfg_from_file(args.cfg)
    ds = YCBVideoDataset(args.data_root, "train")
    c = ds.num_classes
    points, extents = ds.points, ds.extents
    symmetry = np.asarray(ds.symmetry)
    from posecnn_tpu.cli.common import data_flags_from_ckpt

    point_colors, point_normals = colorize_model_library(
        points, **data_flags_from_ckpt(cfg, args.ckpt)
    )
    width, height = cfg.train.syn_width, cfg.train.syn_height
    k = np.array(
        [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32
    )
    if args.scale != 1.0:
        width = int(round(width * args.scale))
        height = int(round(height * args.scale))
        k = k.copy()
        k[:2, :] *= args.scale
    bg_pool = None
    if args.backgrounds:
        import glob as _glob

        from posecnn_tpu.data.procedural import load_background_pool

        bg_files = sorted(_glob.glob(args.backgrounds))
        bg_pool = load_background_pool(bg_files, size_hw=(height, width))
        print(f"oracle background pool: {0 if bg_pool is None else len(bg_pool)} frames")

    # held-out scene distribution == cli/test_net synthetic eval
    gen = SyntheticSceneGenerator(
        points, extents, k, width=width, height=height,
        t_near=cfg.train.syn_tnear, t_far=cfg.train.syn_tfar,
        pixel_means=cfg.pixel_means, seed=args.seed,
        point_colors=point_colors, point_normals=point_normals,
        class_whitelist=(
            [min(cfg.train.syn_class_index, c - 1)]
            if cfg.train.syn_class_index > 0 else None
        ),
        backgrounds=bg_pool,
    )

    from posecnn_tpu.cli.common import head_flags_from_ckpt

    model = PoseCNN(
        num_classes=c,
        num_units=cfg.train.num_units,
        fc_dim=cfg.train.fc_dim,
        **head_flags_from_ckpt(cfg, args.ckpt),
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        vertex_reg=True,
        pose_reg=True,
        hough_num_samples=cfg.train.hough_num_samples,
        max_objects=7,
        gt_pose_rois=True,
    )
    b0 = gen.minibatch(1, dense_vertex_targets=False)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["data"]), jnp.asarray(extents), jnp.asarray(b0["meta"]),
        gt_poses=jnp.asarray(b0["gt_poses"]), gt_valid=jnp.asarray(b0["gt_valid"]),
        train=True, keep_prob=1.0,
    )
    params, step = restore_params(args.ckpt, params)
    print(f"restored checkpoint at step {step}")

    n_gt = b0["gt_poses"].shape[0]

    @jax.jit
    def infer(params, data, meta, gt_poses, gt_valid):
        out = model.apply(
            params, data, jnp.asarray(extents), meta,
            gt_poses=gt_poses, gt_valid=gt_valid, train=True, keep_prob=1.0,
        )
        # injected GT rows are PREPENDED: rows [0, n_gt) of poses_pred
        return out.poses_pred[:n_gt]

    per_class = {i: [] for i in range(c)}
    for _ in range(args.num_images):
        batch = gen.minibatch(1, dense_vertex_targets=False)
        preds = np.asarray(
            infer(
                params,
                jnp.asarray(batch["data"]), jnp.asarray(batch["meta"]),
                jnp.asarray(batch["gt_poses"]), jnp.asarray(batch["gt_valid"]),
            )
        )
        gt = batch["gt_poses"]
        for i in range(n_gt):
            if not batch["gt_valid"][i]:
                continue
            cls = int(gt[i, 1])
            q_pred = preds[i, 4 * cls : 4 * cls + 4]
            nrm = np.linalg.norm(q_pred)
            if nrm < 1e-6:
                continue
            q_pred = q_pred / nrm
            r_pred = np.asarray(quat_to_mat(jnp.asarray(q_pred)))
            r_gt = np.asarray(quat_to_mat(jnp.asarray(gt[i, 6:10])))
            if symmetry[cls] > 0:
                # surface-of-revolution classes: any spin about the
                # object z-axis is the same object — plain geodesic
                # error is chance-bounded noise for them (the r5
                # oracle's 77-94 deg readings). Report the symmetry-
                # aware error instead: the angle between predicted and
                # GT object z-axes (the min geodesic error over the
                # z-spin orbit has this axis-alignment angle as its
                # tilt component; the reference handles these classes
                # by switching the POSE metric to ADD-S,
                # lov.py:539-541 — same idea at the rotation level).
                cosax = float(np.clip(np.dot(r_pred[:, 2], r_gt[:, 2]), -1.0, 1.0))
                err = float(np.degrees(np.arccos(cosax)))
            else:
                # geodesic rotation error (ref pose_error.py:92-106)
                cos = (np.trace(r_pred.T @ r_gt) - 1.0) / 2.0
                err = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
            per_class[cls].append(err)

    rows = {}
    nonsym_mean = []
    nonsym_below45 = 0
    nonsym_total = 0
    for cls in range(1, c):
        errs = per_class[cls]
        if not errs:
            continue
        m = float(np.mean(errs))
        rows[cls] = {
            "n": len(errs),
            "mean_deg": round(m, 1),
            "median_deg": round(float(np.median(errs)), 1),
            "symmetric": bool(symmetry[cls] > 0),
            # symmetric rows: mean/median are the z-AXIS alignment
            # error (spin-invariant), not plain geodesic
            "metric": "axis_deg" if symmetry[cls] > 0 else "geodesic_deg",
        }
        if symmetry[cls] == 0:
            nonsym_mean.append(m)
            nonsym_total += 1
            nonsym_below45 += int(m < 45.0)
    summary = {
        "metric": "rotation_oracle",
        "ckpt_step": int(step),
        "num_images": args.num_images,
        "nonsym_classes": nonsym_total,
        "nonsym_mean_deg": round(float(np.mean(nonsym_mean)), 1) if nonsym_mean else None,
        "nonsym_below_45deg": nonsym_below45,
        "per_class": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_class"}))


if __name__ == "__main__":
    main()
