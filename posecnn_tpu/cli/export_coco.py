"""Export a dataset to COCO format (ref: my_tools/ycb_to_coco.py:95-166
walking LOV frames, my_tools/fat_to_coco.py).

Two sources:
- real frames on disk (any registered pose dataset): walks the image
  set, converts each frame's label/meta into COCO annotations;
- ``--dataset synthetic``: renders N synthetic scenes (saving the
  color/depth PNGs alongside the JSON) so the exporter is runnable
  without dataset frames — the reference has no equivalent because its
  synthesizer never persisted frames.

Annotations carry the reference's custom meta payload
{center, pose (quat+trans), intrinsic_matrix} per object
(ycb_to_coco.py:140) and each image records its depth file +
factor_depth (ycb_to_coco.py:163-165).

  python -m posecnn_tpu.cli.export_coco --dataset synthetic \
      --num_images 20 --output output/coco_syn
"""

from __future__ import annotations

import json
import os

import numpy as np

from posecnn_tpu.cli.common import base_parser, class_data_from_dataset, load_config
from posecnn_tpu.data.coco_export import CocoWriter, frame_annotations


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(arr).save(path)


def _export_synthetic(args, cfg) -> dict:
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator

    t = cfg.train
    num_classes = t.num_classes
    models_dir = os.path.join(args.data_root, "models")
    # geometry source mirrors cli/train_net: real YCB models when on
    # disk, random clouds otherwise (hermetic)
    if os.path.isdir(models_dir):
        from posecnn_tpu.core.registry import DATASETS

        ds = DATASETS.get("ycb_video")(args.data_root, "train")
        points, extents, _ = class_data_from_dataset(ds, 512)
        classes = list(ds.classes[1:])
        k = np.array(
            [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32
        )
    else:  # pure synthetic geometry (hermetic tests)
        rng = np.random.RandomState(0)
        points = rng.uniform(-0.05, 0.05, (num_classes, 256, 3)).astype(np.float32)
        points[0] = 0
        extents = np.abs(points).max(1) * 2.0
        classes = [f"class_{i:02d}" for i in range(1, num_classes)]
        k = np.array(
            [[500.0, 0, t.syn_width / 2.0], [0, 500.0, t.syn_height / 2.0], [0, 0, 1]],
            np.float32,
        )
    gen = SyntheticSceneGenerator(
        points,
        extents,
        k,
        width=t.syn_width,
        height=t.syn_height,
        t_near=t.syn_tnear,
        t_far=t.syn_tfar,
        seed=args.seed,
    )
    writer = CocoWriter(classes, supercategory="YCB")
    img_dir = os.path.join(args.output, "images")
    os.makedirs(img_dir, exist_ok=True)
    annot_id = 1
    for i in range(args.num_images):
        s = gen.render(dense_vertex_targets=False)
        image_id = i + 1
        name = f"{image_id:06d}-color.png"
        depth_name = f"{image_id:06d}-depth.png"
        rgb = np.clip(s.image[:, :, ::-1] + gen.pixel_means[::-1], 0, 255).astype(np.uint8)
        _save_png(os.path.join(img_dir, name), rgb)
        _save_png(
            os.path.join(img_dir, depth_name),
            np.clip(s.depth * 10000.0, 0, 65535).astype(np.uint16),
        )
        writer.add_image(image_id, t.syn_width, t.syn_height, name, depth_name)
        annot_id = frame_annotations(
            writer,
            image_id,
            annot_id,
            s.label,
            s.poses,  # already the 13-col GT blob (data/synthetic.py)
            k,
            segmentation=args.segmentation,
            eps_frac=args.eps,
        )
    return writer.get_annot_json()


def _export_real(args, cfg) -> dict:
    from posecnn_tpu.core.registry import DATASETS
    from posecnn_tpu.data.minibatch import build_pose_blob
    from posecnn_tpu.utils.quaternion import mat_to_quat_np

    ds = DATASETS.get(args.dataset)(args.data_root, args.image_set)
    writer = CocoWriter(list(ds.classes[1:]), supercategory=args.dataset.upper())
    annot_id = 1
    indices = ds.image_index[: args.num_images] if args.num_images else ds.image_index
    for i, index in enumerate(indices):
        frame = ds.load_frame(index)
        if "label" not in frame or "poses" not in frame:
            continue
        image_id = i + 1
        poses = frame["poses"]  # (3, 4, N)
        n = poses.shape[2]
        quats = np.stack([mat_to_quat_np(poses[:, :3, j]) for j in range(n)])
        trans = poses[:, 3, :].T
        centers = frame.get("center", np.zeros((n, 2), np.float32))
        gt = build_pose_blob(
            0, frame["cls_indexes"].astype(np.int32), quats, trans, centers=centers
        )
        h, w = frame["label"].shape[:2]
        writer.add_image(
            image_id, w, h, f"{index}-color.png", f"{index}-depth.png",
            factor_depth=float(np.squeeze(frame["meta"].get("factor_depth", 10000.0))),
        )
        annot_id = frame_annotations(
            writer,
            image_id,
            annot_id,
            frame["label"],
            gt,
            frame["intrinsic_matrix"],
            segmentation=args.segmentation,
            eps_frac=args.eps,
        )
    return writer.get_annot_json()


def main(argv=None):
    parser = base_parser("Export dataset to COCO JSON (ref my_tools/ycb_to_coco.py)")
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--data_root", default="/root/reference/data/LOV")
    parser.add_argument("--image_set", default="train")
    parser.add_argument("--output", default="output/coco")
    parser.add_argument("--num_images", type=int, default=10)
    parser.add_argument("--segmentation", choices=["polygon", "rle"], default="polygon")
    parser.add_argument("--eps", type=float, default=0.003, help="polygon simplify frac")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    cfg = load_config(args)

    os.makedirs(args.output, exist_ok=True)
    if args.dataset == "synthetic":
        data = _export_synthetic(args, cfg)
    else:
        data = _export_real(args, cfg)
    out_file = os.path.join(args.output, "annotations.json")
    with open(out_file, "w") as f:
        json.dump(data, f)
    print(
        json.dumps(
            {
                "out": out_file,
                "images": len(data["images"]),
                "annotations": len(data["annotations"]),
                "categories": len(data["categories"]),
            }
        )
    )
    return data


if __name__ == "__main__":
    main()
