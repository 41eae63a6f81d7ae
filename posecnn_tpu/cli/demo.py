"""Demo: single-frame PoseCNN inference on the demo image fixture.

Equivalent of tools/demo.py (ref: tools/demo.py:108-147 →
lib/fcn/test.py:1833-1952 test_net_images): loads the 5 RGB-D demo
frames, runs the full inference graph (seg + vertex + hough + pose
head), applies NMS, optional ICP refinement from depth, and writes
label maps + detections to an output directory.

Run:
  python -m posecnn_tpu.cli.demo --images /root/reference/data/demo_images \
      --ckpt <snapshot.npz> --output output/demo
Without --ckpt the net runs with random weights (pipeline check).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


def main(argv=None):
    parser = base_parser("PoseCNN demo (ref: tools/demo.py)")
    parser.add_argument("--images", default="/root/reference/data/demo_images")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output", default="output/demo")
    parser.add_argument("--num_points", type=int, default=512)
    parser.add_argument("--refine", action="store_true", help="ICP depth refinement")
    parser.add_argument("--max_frames", type=int, default=0)
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from posecnn_tpu.data.datasets import DemoDataset, YCBVideoDataset
    from posecnn_tpu.data.minibatch import build_meta_blob
    from posecnn_tpu.engine.evaluate import extract_detections
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.ops.nms import nms_per_class
    from posecnn_tpu.core.checkpoint import restore_params

    ds = DemoDataset(args.images)
    num_classes = ds.num_classes
    # model geometry from the real YCB models if present
    lov_root = os.path.join(os.path.dirname(args.images.rstrip("/")), "LOV")
    if os.path.exists(os.path.join(lov_root, "models")):
        lov = YCBVideoDataset(lov_root, "debug", num_points=args.num_points)
        points, extents = lov.points, lov.extents
    else:
        # canonical procedural library — the geometry checkpoints were
        # trained on (data/procedural.synthetic_class_library); zero
        # points would make the ICP/projection stages meaningless
        from posecnn_tpu.data.procedural import synthetic_class_library

        proc = synthetic_class_library(num_classes, args.num_points)
        points, extents = proc.points, proc.extents

    from posecnn_tpu.cli.common import head_flags_from_ckpt

    model = PoseCNN(
        num_classes=num_classes,
        num_units=cfg.train.num_units,
        fc_dim=cfg.train.fc_dim,
        **head_flags_from_ckpt(cfg, args.ckpt),
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        hough_num_samples=cfg.test.hough_num_samples,
        max_objects=16,
        vote_threshold=-1.0,  # single-instance demo (ref demo.py default)
    )

    frame0 = ds.load_frame(ds.image_index[0])
    h, w = frame0["color"].shape[:2]
    pixel_means = np.asarray(cfg.pixel_means, np.float32)

    def preprocess(frame):
        # BGR order + mean subtraction (ref: test.py _get_image_blob)
        rgb = frame["color"][:, :, :3].astype(np.float32)
        bgr = rgb[:, :, ::-1]
        return bgr - pixel_means

    data0 = jnp.zeros((1, h, w, 3), jnp.float32)
    meta0 = jnp.asarray(build_meta_blob(ds.intrinsic_matrix)[None])
    params = model.init(jax.random.PRNGKey(cfg.rng_seed), data0, jnp.asarray(extents), meta0, train=False)
    if args.ckpt:
        params, step = restore_params(args.ckpt, params)
        print(f"restored checkpoint at step {step}")

    @jax.jit
    def infer(params, data, meta):
        out = model.apply(params, data, jnp.asarray(extents), meta, train=False)
        keep = nms_per_class(out.hough.rois, 0.5, out.hough.valid)
        return out.label_2d, out.hough.rois, out.hough.poses_init, out.poses_pred, keep

    os.makedirs(args.output, exist_ok=True)
    results = []
    frames = ds.image_index[: args.max_frames] if args.max_frames else ds.image_index
    for idx in frames:
        frame = ds.load_frame(idx)
        data = jnp.asarray(preprocess(frame)[None])
        t0 = time.perf_counter()
        label, rois, poses_init, poses_pred, keep = infer(params, data, meta0)
        jax.block_until_ready(label)
        dt = time.perf_counter() - t0
        dets = extract_detections(rois, poses_init, poses_pred, np.asarray(keep), num_classes)

        # network poses kept alongside ICP output, keyed by DETECTION
        # INDEX (multi-instance mode can emit several detections of the
        # same class; a class-keyed dict would alias them all to the
        # last instance's init pose)
        init_poses = {}
        if args.refine and "depth" in frame:
            from posecnn_tpu.refine.icp import refine_pose_icp

            refined = []
            lab = np.asarray(label[0])
            for det_i, (cls, q, t) in enumerate(dets):
                init_poses[det_i] = (np.asarray(q).tolist(), np.asarray(t).tolist())
                mask = lab == cls
                res = refine_pose_icp(
                    jnp.asarray(q), jnp.asarray(t), jnp.asarray(points[cls]),
                    jnp.asarray(frame["depth"]), jnp.asarray(mask),
                    jnp.asarray(ds.intrinsic_matrix),
                )
                refined.append((cls, np.asarray(res.quat), np.asarray(res.trans)))
            dets = refined

        np.save(os.path.join(args.output, f"{idx}-label.npy"), np.asarray(label[0]))
        # rendered overlay: label tint + projected 3D extent boxes
        # (the reference's vis_segmentations_vertmaps_detection output,
        # test.py:815, saved headless instead of shown)
        from posecnn_tpu.data.datasets import YCB_CLASS_COLORS
        from posecnn_tpu.utils.visualize import (
            draw_detections,
            overlay_label,
            save_image,
        )

        vis = overlay_label(
            frame["color"][:, :, :3], np.asarray(label[0]), YCB_CLASS_COLORS
        )
        vis = draw_detections(
            vis, dets, extents, ds.intrinsic_matrix,
            class_colors=YCB_CLASS_COLORS, class_names=ds.classes,
        )
        save_image(os.path.join(args.output, f"{idx}-overlay.png"), vis)
        det_json = [
            {"class": int(c), "class_name": ds.classes[int(c)],
             "quat_wxyz": np.asarray(q).tolist(), "trans": np.asarray(t).tolist(),
             **(
                 {"quat_wxyz_init": init_poses[det_i][0],
                  "trans_init": init_poses[det_i][1]}
                 if det_i in init_poses else {}
             )}
            for det_i, (c, q, t) in enumerate(dets)
        ]
        results.append({"frame": idx, "seconds": dt, "detections": det_json})
        print(f"{idx}: {len(dets)} detections, {dt * 1000:.1f} ms")

    with open(os.path.join(args.output, "detections.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}/detections.json")


if __name__ == "__main__":
    main()
