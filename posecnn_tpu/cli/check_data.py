"""Data sanity checker: render training blobs to inspection images.

Equivalent of the reference's manual check scripts
(ref: tools/check_data.py / check_data_lov.py and the VISUALIZE debug
path, gt_synthesize_layer/minibatch.py:580-675): renders a few
minibatches and writes label overlays, vertex-direction maps, GT box
projections, and depth maps as PNGs for eyeballing.
"""

from __future__ import annotations

import os

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


def main(argv=None):
    parser = base_parser("Training-blob sanity visualization")
    parser.add_argument("--output", default="output/check_data")
    parser.add_argument("--num_samples", type=int, default=3)
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)

    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.utils.visualize import (
        draw_detections,
        overlay_label,
        save_image,
    )

    c = cfg.train.num_classes
    w, h = cfg.train.syn_width, cfg.train.syn_height
    from posecnn_tpu.data.procedural import synthetic_class_library

    proc = synthetic_class_library(c, 512)
    points, extents = proc.points, proc.extents
    k = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]], np.float32)
    gen = SyntheticSceneGenerator(
        points, extents, k, width=w, height=h, t_near=cfg.train.syn_tnear,
        t_far=cfg.train.syn_tfar, pixel_means=cfg.pixel_means, seed=cfg.rng_seed,
        point_colors=proc.colors, point_normals=proc.normals,
    )
    colors = gen.class_colors

    os.makedirs(args.output, exist_ok=True)
    for i in range(args.num_samples):
        s = gen.render()
        rgb = np.clip(s.image + gen.pixel_means, 0, 255)[:, :, ::-1]
        save_image(os.path.join(args.output, f"{i:03d}-color.png"), rgb)
        save_image(
            os.path.join(args.output, f"{i:03d}-label.png"),
            overlay_label(rgb, s.label, colors),
        )
        dets = [(int(r[1]), r[6:10], r[10:13]) for r in s.poses]
        save_image(
            os.path.join(args.output, f"{i:03d}-gtboxes.png"),
            draw_detections(rgb, dets, extents, k, colors),
        )
        # vertex direction field as hue-ish RG image on labeled pixels
        vert = np.zeros((h, w, 3), np.float32)
        lab = s.label
        ys, xs = np.nonzero(lab > 0)
        cls = lab[ys, xs]
        vert[ys, xs, 0] = (s.vertex_targets[ys, xs, 3 * cls] + 1) * 127.5
        vert[ys, xs, 1] = (s.vertex_targets[ys, xs, 3 * cls + 1] + 1) * 127.5
        save_image(os.path.join(args.output, f"{i:03d}-vertex.png"), vert)
        d = s.depth / max(s.depth.max(), 1e-6) * 255
        save_image(os.path.join(args.output, f"{i:03d}-depth.png"), np.stack([d] * 3, -1))
        print(f"sample {i}: {len(dets)} objects, {int((lab > 0).sum())} fg px")
    print(f"wrote {args.output}/")


if __name__ == "__main__":
    main()
