"""KinectFusion-subsystem drive: TSDF fusion + tracking + raycast.

Equivalent of the reference's manual KinectFusion check
(ref: tools/test_kinect_fusion.py, launched by
experiments/scripts/test_kinect_fusion.sh, which feeds RGB-D frames
into the kfusion pipeline and inspects the fused volume visually).
Here the drive is quantitative, on a synthetic camera-motion sequence
with known ground truth:

  1. fuse GT depth + GT label probabilities into the TSDF volume at
     GT camera poses (refine/fusion.fuse_frame);
  2. raycast the fused volume from each camera pose and compare the
     predicted depth/label maps against the rendered GT
     (refine/fusion.raycast — ref raycast.cu);
  3. track each frame against the previous frame's raycast prediction
     and compare the recovered camera motion with GT
     (refine/fusion.track_camera — ref icp.cu:24-234);
  4. extract the label surface and report class coverage
     (refine/fusion.extract_surface — ref marchingCubes.cu).
"""

from __future__ import annotations

import json
import os

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


def main(argv=None):
    parser = base_parser("KinectFusion (TSDF fusion/tracking) subsystem check")
    parser.add_argument("--output", default="output/test_fusion")
    parser.add_argument("--num_steps", type=int, default=5)
    parser.add_argument("--grid_size", type=int, default=64)
    parser.add_argument("--visualize", action="store_true")
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from posecnn_tpu.data.synthetic import (
        SyntheticSceneGenerator,
        SyntheticSequenceGenerator,
    )
    from posecnn_tpu.refine.fusion import (
        create_volume,
        extract_surface,
        fuse_frame,
        raycast,
        track_camera,
    )

    c = cfg.train.num_classes
    w, h = cfg.train.syn_width, cfg.train.syn_height
    from posecnn_tpu.data.procedural import synthetic_class_library

    # dense clouds: the TSDF integration quality is bounded by depth-map
    # coverage; 512-point splats leave holes that carve false surface
    proc = synthetic_class_library(c, 2048)
    points, extents = proc.points, proc.extents
    k = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, t_near=cfg.train.syn_tnear,
        t_far=cfg.train.syn_tfar, pixel_means=cfg.pixel_means, seed=cfg.rng_seed,
        point_colors=proc.colors, point_normals=proc.normals,
    )
    seq = SyntheticSequenceGenerator(gen, num_steps=args.num_steps).minibatch(1)

    # scene depth spans roughly [t_near, t_far] along +z in frame-0
    # camera coordinates; center the volume there
    span = cfg.train.syn_tfar + 0.3
    vol = create_volume(
        args.grid_size, c, origin=(-span / 2, -span / 2, 0.2),
        voxel_size=span / args.grid_size,
    )

    # --- 1. fuse all frames at GT camera poses ---
    eye34 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    w2l_list = []
    for t in range(args.num_steps):
        w2l = seq["meta"][t, 0][18:30].reshape(3, 4).astype(np.float32)
        if t == 0:
            w2l = eye34
        w2l_list.append(w2l)
        prob = jax.nn.one_hot(jnp.asarray(seq["label"][t, 0]), c)
        vol = fuse_frame(
            vol, jnp.asarray(seq["depth"][t, 0]), prob, jnp.asarray(k),
            jnp.asarray(w2l),
        )

    # --- 2. raycast back from each pose; compare with GT depth/label ---
    os.makedirs(args.output, exist_ok=True)
    depth_errs, label_accs = [], []
    for t in range(args.num_steps):
        r = np.asarray(w2l_list[t][:, :3])
        c2w = np.concatenate([r.T, (-r.T @ w2l_list[t][:, 3])[:, None]], 1)
        d_pred, _, lab_pred = raycast(
            vol, jnp.asarray(k), jnp.asarray(c2w.astype(np.float32)),
            height=h, width=w, near=0.2, far=span + 0.2,
        )
        d_pred = np.asarray(d_pred)
        lab_pred = np.asarray(lab_pred)
        d_gt = seq["depth"][t, 0]
        both = (d_pred > 1e-6) & (d_gt > 1e-6)
        if both.sum():
            depth_errs.append(float(np.abs(d_pred - d_gt)[both].mean()))
        fg = (seq["label"][t, 0] > 0) & (d_pred > 1e-6)
        if fg.sum():
            label_accs.append(float((lab_pred[fg] == seq["label"][t, 0][fg]).mean()))
        if args.visualize:
            from posecnn_tpu.utils.visualize import label_to_color, save_image

            save_image(
                os.path.join(args.output, f"{t:03d}-raycast-label.png"),
                label_to_color(lab_pred, gen.class_colors),
            )
            dn = d_pred / max(d_pred.max(), 1e-6) * 255
            save_image(
                os.path.join(args.output, f"{t:03d}-raycast-depth.png"),
                np.stack([dn] * 3, -1),
            )

    # --- 3. frame-to-model tracking vs GT relative motion ---
    track_rot_errs, track_trans_errs = [], []
    for t in range(1, args.num_steps):
        r_prev = np.asarray(w2l_list[t - 1][:, :3])
        c2w_prev = np.concatenate(
            [r_prev.T, (-r_prev.T @ w2l_list[t - 1][:, 3])[:, None]], 1
        )
        model_depth, _, _ = raycast(
            vol, jnp.asarray(k), jnp.asarray(c2w_prev.astype(np.float32)),
            height=h, width=w, near=0.2, far=span + 0.2,
        )
        rt = np.asarray(
            track_camera(
                jnp.asarray(seq["depth"][t, 0]), model_depth, jnp.asarray(k),
                jnp.asarray(eye34), num_iters=8,
            )
        )
        # GT relative pose: cam_t ← world ← cam_{t-1}
        r_t, t_t = w2l_list[t][:, :3], w2l_list[t][:, 3]
        rel_r = r_t @ r_prev.T
        rel_t = t_t - rel_r @ w2l_list[t - 1][:, 3]
        cos = np.clip(0.5 * (np.trace(rt[:, :3].T @ rel_r) - 1), -1, 1)
        track_rot_errs.append(float(np.degrees(np.arccos(cos))))
        track_trans_errs.append(float(np.linalg.norm(rt[:, 3] - rel_t)))

    # --- 4. surface extraction ---
    pts, labels_surf, valid = extract_surface(vol, max_points=16384)
    nvalid = int(np.asarray(valid).sum())
    classes_seen = sorted(
        int(x) for x in np.unique(np.asarray(labels_surf)[np.asarray(valid)])
    )

    # triangle mesh (marching tetrahedra — ref marchingCubes.cu)
    from posecnn_tpu.refine.fusion import extract_mesh

    tri_verts, tri_labels, tri_valid = extract_mesh(vol, max_triangles=16384)
    tv = np.asarray(tri_verts)[np.asarray(tri_valid)]
    mesh_area = (
        float(
            0.5
            * np.linalg.norm(
                np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1
            ).sum()
        )
        if len(tv)
        else 0.0
    )

    # PLY export (ref: kfusion.save_model kfusion.pyx:76-77)
    from posecnn_tpu.refine.fusion import save_mesh_ply

    ply_path = os.path.join(args.output, "model.ply")
    n_faces = save_mesh_ply(ply_path, tri_verts, tri_labels, tri_valid)

    summary = dict(
        num_steps=args.num_steps,
        ply_faces=n_faces,
        grid_size=args.grid_size,
        raycast_depth_mae_m=float(np.mean(depth_errs)) if depth_errs else None,
        raycast_fg_label_acc=float(np.mean(label_accs)) if label_accs else None,
        tracking_rot_err_deg=track_rot_errs,
        tracking_trans_err_m=track_trans_errs,
        surface_points=nvalid,
        surface_classes=classes_seen,
        mesh_triangles=int(len(tv)),
        mesh_area_m2=mesh_area,
    )
    with open(os.path.join(args.output, "fusion_report.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
