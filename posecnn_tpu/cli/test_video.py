"""Video-mode evaluation: recurrent segmentation + TSDF fusion.

Equivalent of the reference's video test path (ref: lib/fcn/test.py:
381-555 test_net — per frame: KinectFusion camera tracking →
recurrent net with flow-warped state → label fusion into the TSDF
volume → surface extraction). Runs on synthetic camera-motion
sequences; reports per-frame seg IoU and the fused-volume label
surface.
"""

from __future__ import annotations

import json
import os

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


def main(argv=None):
    parser = base_parser("PoseCNN video evaluation (ref: test_net video path)")
    parser.add_argument("--num_sequences", type=int, default=2)
    parser.add_argument("--num_steps", type=int, default=4)
    parser.add_argument("--output", default="output/eval_video")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--seed", type=int, default=77)
    parser.add_argument(
        "--dataset", default="synthetic",
        help="'synthetic' (camera-orbit sequences) or a registered "
        "dataset name (ycb_video/lov) to feed REAL video frames via "
        "get_real_video_minibatch (ref: GtDataLayer real sequences, "
        "lib/gt_data_layer/minibatch.py:20-310)",
    )
    parser.add_argument("--data_root", default="/root/reference/data/LOV")
    parser.add_argument("--image_set", default="val")
    parser.add_argument(
        "--grid_size", type=int, default=0,
        help="TSDF voxel grid side; 0 = cfg.test.grid_size "
        "(ref: TEST.GRID_SIZE, lib/fcn/test.py:403). The reference "
        "default 256 needs ~GBs on CPU — pass a smaller value for "
        "quick checks.",
    )
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from posecnn_tpu.core.checkpoint import restore_params
    from posecnn_tpu.data.synthetic import (
        SyntheticSceneGenerator,
        SyntheticSequenceGenerator,
    )
    from posecnn_tpu.engine.evaluate import fast_hist, iou_from_hist
    from posecnn_tpu.models.recurrent import RecurrentSegNet
    from posecnn_tpu.refine.fusion import (
        create_volume,
        extract_surface,
        fuse_frame,
        track_camera,
    )

    c = cfg.train.num_classes
    w, h = cfg.train.syn_width, cfg.train.syn_height
    from posecnn_tpu.data.procedural import synthetic_class_library

    proc = synthetic_class_library(c, 256)
    points, extents = proc.points, proc.extents
    k = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, t_near=cfg.train.syn_tnear,
        t_far=cfg.train.syn_tfar, pixel_means=cfg.pixel_means, seed=args.seed,
        point_colors=proc.colors, point_normals=proc.normals,
    )
    seq_gen = SyntheticSequenceGenerator(gen, num_steps=args.num_steps)

    # real-frame video sequences when a dataset with frames is on disk
    # (ref: GtDataLayer feeds real NUM_STEPS blocks; the voxel grid and
    # camera motion ride in meta[18:48])
    real_ds = None
    if args.dataset != "synthetic":
        from posecnn_tpu.core.registry import DATASETS
        from posecnn_tpu.data.minibatch import get_real_video_minibatch

        real_ds = DATASETS.get(args.dataset)(args.data_root, args.image_set)
        if not real_ds.image_index or not os.path.exists(
            real_ds.frame_prefix(real_ds.image_index[0]) + "-color.png"
        ):
            raise FileNotFoundError(
                f"--dataset {args.dataset}: no frames under {args.data_root}"
            )
        c = real_ds.num_classes
        pixel_means = np.asarray(cfg.pixel_means, np.float32)
        frame0 = real_ds.load_frame(real_ds.image_index[0])
        # TEST.SCALES_BASE rescale (ref: im_segment's scale handling)
        sb = float(cfg.test.scales_base[0]) if cfg.test.scales_base else 1.0
        h = int(round(frame0["color"].shape[0] * sb))
        w = int(round(frame0["color"].shape[1] * sb))
        n_index = len(real_ds.image_index)

        def real_seq(s):
            return get_real_video_minibatch(
                real_ds, [(s * args.num_steps) % n_index],
                num_steps=args.num_steps,
                height=h, width=w, pixel_means=pixel_means, scale=sb,
            )

    model = RecurrentSegNet(num_classes=c, num_units=cfg.train.num_units)
    sample = real_seq(0) if real_ds is not None else seq_gen.minibatch(1)
    frames = jnp.asarray(sample["image"])
    depths = jnp.asarray(sample["depth"])
    metas = jnp.asarray(sample["meta"])
    params = model.init(jax.random.PRNGKey(cfg.rng_seed), frames, depths, metas)
    if args.ckpt:
        params, _ = restore_params(args.ckpt, params)

    apply_fn = jax.jit(model.apply)

    os.makedirs(args.output, exist_ok=True)
    results = []
    for s in range(args.num_sequences):
        seq = real_seq(s) if real_ds is not None else seq_gen.minibatch(1)
        if real_ds is not None:
            # intrinsics ride in the meta blob for real sequences
            k = seq["meta"][0, 0, :9].reshape(3, 3).astype(np.float32)
        frames = jnp.asarray(seq["image"])
        depths = jnp.asarray(seq["depth"])
        metas = jnp.asarray(seq["meta"])
        log_probs, labels_pred, _ = apply_fn(params, frames, depths, metas)
        labels_pred = np.asarray(labels_pred)[:, 0]
        gt = seq["label"][:, 0]

        # per-frame IoU (the acceptance metric of the video path)
        hist = np.zeros((c, c), np.int64)
        for t in range(args.num_steps):
            hist += fast_hist(gt[t].flatten(), labels_pred[t].flatten(), c)
        iou = iou_from_hist(hist)

        # fuse predicted labels + depth into a TSDF volume and track
        # the camera against raycast-free previous-frame depth
        gs = args.grid_size or cfg.test.grid_size
        # fixed physical span (the reference sizes the volume to the
        # scene, test.py:403-520); voxel size scales inversely with gs
        vol = create_volume(
            gs, c, origin=(-0.8, -0.6, 0.3), voxel_size=0.035 * 48.0 / gs
        )
        track_errs = []
        for t in range(args.num_steps):
            depth_t = jnp.asarray(seq["depth"][t, 0])
            prob_t = jax.nn.one_hot(jnp.asarray(labels_pred[t]), c)
            w2l = seq["meta"][t, 0][18:30].reshape(3, 4).astype(np.float32)
            if t == 0:
                w2l = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
            vol = fuse_frame(vol, depth_t, prob_t, jnp.asarray(k), jnp.asarray(w2l))
            if t > 0:
                rt = track_camera(
                    depth_t, jnp.asarray(seq["depth"][t - 1, 0]), jnp.asarray(k),
                    jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)),
                    num_iters=6,
                )
                track_errs.append(float(jnp.linalg.norm(rt[:, 3])))
        pts, labels_surf, valid = extract_surface(vol, max_points=8192)
        n_surface = int(np.asarray(valid).sum())
        results.append(
            {
                "sequence": s,
                "mean_iou": float(iou[hist.sum(1) > 0].mean()),
                "surface_points": n_surface,
                "tracked_motion_m": track_errs,
            }
        )
        print(f"seq {s}: IoU {results[-1]['mean_iou']:.3f}, surface {n_surface} pts")

    with open(os.path.join(args.output, "video_eval.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}/video_eval.json")
    return results


if __name__ == "__main__":
    main()
