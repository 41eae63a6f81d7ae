"""Tiny-CNN rotation learnability probe (architecture-independent).

Renders N single-object crops (same generator/paint as the rotation
probe), then trains a small from-scratch CNN (4 conv + 2 fc, ~1M
params) to regress the quaternion with the SAME ADD loss the
framework uses. This bounds the TASK's learnability separately from
the flagship architecture: the pixel-NN oracle (probe_data_nn.py)
says the appearance determines rotation; if a small CNN can learn it
in minutes but the VGG+RoI-pool flagship cannot in 20k iters, the
remaining problem is flagship-specific (optimizer scale /
architecture), not the data or the loss.

Usage: python experiments/probe_tiny_cnn.py --n 4000 --steps 3000 --device cpu
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--holdout", type=int, default=256)
    ap.add_argument("--patch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cls_index", type=int, default=1)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--data_root", default="/root/reference/data/LOV")
    ap.add_argument("--seed", type=int, default=555)
    ap.add_argument("--out", default="output/probe_tiny_cnn.json")
    ap.add_argument("--augment", action="store_true")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from posecnn_tpu.core.config import cfg_from_file
    from posecnn_tpu.data.datasets import YCBVideoDataset
    from posecnn_tpu.data.procedural import (
        colorize_model_library,
        load_background_pool,
    )
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.ops.add_loss import average_distance_loss
    from posecnn_tpu.utils.quaternion import quat_to_mat

    from experiments.probe_data_nn import resize_patch

    cfg = cfg_from_file("experiments/cfgs/rot_probe.yaml")
    ds = YCBVideoDataset(args.data_root, "train")
    points, extents = ds.points, ds.extents
    point_colors, point_normals = colorize_model_library(
        points, orient_detail=True
    )
    k = np.array(
        [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]],
        np.float32,
    )
    import glob

    bg = load_background_pool(
        sorted(glob.glob("output/bg_pool/*.png")), size_hw=(160, 160)
    )
    gen = SyntheticSceneGenerator(
        points, extents, k, width=160, height=160,
        t_near=cfg.train.syn_tnear, t_far=cfg.train.syn_tfar,
        pixel_means=cfg.pixel_means, seed=args.seed,
        class_whitelist=[args.cls_index],
        point_colors=point_colors, point_normals=point_normals,
        backgrounds=bg,
    )

    from posecnn_tpu.ops.hough_voting import _gt_projected_boxes
    import jax.numpy as jnp2  # noqa

    patches, quats = [], []
    while len(patches) < args.n:
        b = gen.minibatch(1, dense_vertex_targets=False)
        gt, gv, img = b["gt_poses"], b["gt_valid"], b["data"][0]
        for i in range(gt.shape[0]):
            if not gv[i]:
                continue
            box = np.asarray(
                _gt_projected_boxes(
                    jnp.asarray(gt[i : i + 1]), jnp.asarray(extents),
                    k[0, 0], k[1, 1], k[0, 2], k[1, 2],
                )[0]
            )
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            x1 = max(x1, 0); y1 = max(y1, 0)
            x2 = min(x2, 160); y2 = min(y2, 160)
            if x2 - x1 < 8 or y2 - y1 < 8:
                continue
            patches.append(resize_patch(img[y1:y2, x1:x2], args.patch))
            quats.append(gt[i, 6:10].copy())
            break
    x_all = np.stack(patches) / 64.0  # roughly unit-scale inputs
    q_all = np.stack(quats).astype(np.float32)
    print(f"{len(x_all)} crops rendered")

    ho = args.holdout
    x_tr, q_tr = x_all[ho:], q_all[ho:]
    x_te, q_te = x_all[:ho], q_all[:ho]

    pts_cls = jnp.asarray(points[args.cls_index][
        np.linspace(0, points.shape[1] - 1, 128).astype(int)
    ])[None]  # (1, P, 3) single "class"

    class TinyPoseNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            for ch in (32, 64, 128, 256):
                x = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2))(x))
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(256)(x))
            x = nn.Dense(4)(x)
            return x

    model = TinyPoseNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, args.patch, args.patch, 3)))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def loss_fn(p, xb, qb):
        raw = model.apply(p, xb)  # (B, 4)
        norm = jnp.sqrt(jnp.sum(raw * raw, 1, keepdims=True) + 1e-12)
        qn = raw / jnp.maximum(norm, 1e-2)
        w = jnp.ones_like(qn)
        lp = average_distance_loss(
            qn, qb, w, pts_cls, jnp.zeros((1,)), margin=0.01,
            num_valid=jnp.asarray(float(xb.shape[0])),
        )
        lq = jnp.mean((norm[:, 0] - 1.0) ** 2)
        return lp + 0.1 * lq, lp

    @jax.jit
    def step(p, o, xb, qb):
        (_, lp), g = jax.value_and_grad(loss_fn, has_aux=True)(p, xb, qb)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, lp

    @jax.jit
    def rot_err_deg(p, xb, qb):
        raw = model.apply(p, xb)
        norm = jnp.sqrt(jnp.sum(raw * raw, 1, keepdims=True) + 1e-12)
        qn = raw / jnp.maximum(norm, 1e-2)
        r1 = quat_to_mat(qn)
        r2 = quat_to_mat(qb)
        tr = jnp.einsum("bij,bij->b", r1, r2)
        cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        return jnp.degrees(jnp.arccos(cos))

    def augment(xb, rng):
        """Anti-shortcut augmentation: the renderer's splat speckle
        gives every crop a unique high-frequency fingerprint, and an
        unaugmented CNN memorizes it in ~250 steps instead of reading
        the paint (train loss 1e-4 while test sits near chance).
        Gaussian noise + sub-crop jitter + brightness scale destroy
        the fingerprint but preserve the chroma field."""
        b, p, _, _ = xb.shape
        out = np.empty_like(xb)
        for i in range(b):
            img = xb[i]
            dx, dy = rng.randint(-3, 4, 2)
            img = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
            img = img * rng.uniform(0.85, 1.15) + rng.randn(*img.shape).astype(np.float32) * 0.12
            out[i] = img
        return out

    rng = np.random.RandomState(0)
    hist = []
    for it in range(1, args.steps + 1):
        idx = rng.randint(0, len(x_tr), args.batch)
        xb = augment(x_tr[idx], rng) if args.augment else x_tr[idx]
        params, opt, lp = step(
            params, opt, jnp.asarray(xb), jnp.asarray(q_tr[idx])
        )
        if it % 250 == 0 or it == 1:
            errs = np.asarray(rot_err_deg(params, jnp.asarray(x_te), jnp.asarray(q_te)))
            rec = {
                "iter": it,
                "loss_pose": round(float(lp), 4),
                "test_mean_deg": round(float(errs.mean()), 1),
                "test_median_deg": round(float(np.median(errs)), 1),
                "test_below_45": int((errs < 45).sum()),
            }
            hist.append(rec)
            print(rec, flush=True)
    out = {
        "metric": "tiny_cnn_rotation",
        "n_train": len(x_tr), "n_test": ho, "steps": args.steps,
        "final": hist[-1], "history": hist,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
