"""Train PoseCNN (ref: tools/train_net.py:263-334 + train_net
lib/fcn/train.py:478-563).

Run (synthetic data, no real dataset frames needed):
  python -m posecnn_tpu.cli.train_net --cfg experiments/cfgs/synthetic_small.yaml \
      --iters 200 --output output/syn

With real YCB-Video frames on disk:
  python -m posecnn_tpu.cli.train_net --dataset ycb_video \
      --data_root /path/to/LOV --image_set train --cfg experiments/cfgs/lov_color_2d.yaml
"""

from __future__ import annotations

import json
import os

import numpy as np

from posecnn_tpu.cli.common import base_parser, load_config, setup_device


def main(argv=None):
    parser = base_parser("PoseCNN training (ref: tools/train_net.py)")
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--data_root", default="/root/reference/data/LOV")
    parser.add_argument("--image_set", default="train")
    parser.add_argument("--output", default="output/train")
    parser.add_argument("--iters", type=int, default=0, help="override max_iters")
    parser.add_argument("--ckpt", default=None, help="resume checkpoint")
    parser.add_argument("--pretrained", default=None, help="vgg16.npy imagenet weights")
    parser.add_argument("--num_data", type=int, default=-1, help="mesh data-axis size")
    args = parser.parse_args(argv)
    setup_device(args)
    cfg = load_config(args)
    max_iters = args.iters or cfg.train.max_iters

    import jax
    import jax.numpy as jnp

    from posecnn_tpu.core.checkpoint import (
        import_vgg16_npy,
        prune_snapshots,
        restore_params,
        save_params,
        snapshot_path,
    )
    from posecnn_tpu.data.datasets import YCBVideoDataset
    from posecnn_tpu.data.synthetic import SyntheticSceneGenerator
    from posecnn_tpu.engine.train import TrainState, create_train_state, train_loop
    from posecnn_tpu.models import PoseCNN
    from posecnn_tpu.parallel.mesh import batch_sharding, create_mesh, replicated

    c = cfg.train.num_classes
    ds = None
    # class geometry: real YCB models when available, else synthetic
    if args.dataset in ("ycb_video", "lov") or (
        args.dataset == "synthetic" and os.path.exists(os.path.join(args.data_root, "models"))
    ):
        ds = YCBVideoDataset(args.data_root, args.image_set)
        c = ds.num_classes
        points_full = ds.points
        extents = ds.extents
        symmetry = np.asarray(ds.symmetry)
        k = np.array(
            [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32
        )
    else:
        rng = np.random.RandomState(0)
        points_full = (rng.rand(c, 2620, 3).astype(np.float32) - 0.5) * 0.12
        points_full[0] = 0
        extents = np.abs(points_full).max(1) * 2
        symmetry = np.zeros(c, np.float32)
        k = np.array(
            [[500.0, 0, cfg.train.syn_width / 2], [0, 500.0, cfg.train.syn_height / 2], [0, 0, 1]],
            np.float32,
        )

    idx = np.linspace(0, points_full.shape[1] - 1, cfg.train.add_num_points).astype(int)
    points = points_full[:, idx]

    gen = SyntheticSceneGenerator(
        points_full,
        extents,
        k,
        width=cfg.train.syn_width,
        height=cfg.train.syn_height,
        t_near=cfg.train.syn_tnear,
        t_far=cfg.train.syn_tfar,
        pixel_means=cfg.pixel_means,
        seed=cfg.rng_seed,
    )

    model = PoseCNN(
        num_classes=c,
        num_units=cfg.train.num_units,
        fc_dim=cfg.train.fc_dim,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        vertex_reg=cfg.train.vertex_reg_2d or cfg.train.vertex_reg_3d,
        pose_reg=cfg.train.pose_reg,
        adaptation=cfg.train.adapt,
        input_format="RGBD" if cfg.input == "RGBD" else "COLOR",
        threshold_label=cfg.train.threshold_label,
        vote_threshold=cfg.train.voting_threshold,
        hough_num_samples=cfg.train.hough_num_samples,
        max_objects=max(1, cfg.train.max_rois // max(cfg.train.ims_per_batch, 1) // 9),
    )

    n_dev = len(jax.devices())
    use_mesh = args.num_data != 1 and n_dev > 1
    mesh = create_mesh(num_data=args.num_data if args.num_data > 0 else -1) if use_mesh else None

    batch_size = cfg.train.ims_per_batch
    if mesh is not None:
        ddev = mesh.shape["data"]
        batch_size = max(batch_size, ddev) // ddev * ddev

    # real-frame feed when actual dataset frames are on disk; synthetic
    # batches are ratio-interleaved per cfg.train.syn_ratio (ref:
    # GtSynthesizeLayer ratio sampling layer.py:76-113)
    from posecnn_tpu.data.minibatch import get_real_minibatch, normals_from_depth_np
    from posecnn_tpu.data.pipeline import RatioSampler, ShuffledIndexer

    have_real = ds is not None and len(ds.image_index) > 0 and os.path.exists(
        ds.frame_prefix(ds.image_index[0]) + "-color.png"
    )
    data_rng = np.random.RandomState(cfg.rng_seed)
    pixel_means = np.asarray(cfg.pixel_means, np.float32)
    if have_real:
        n_index = len(ds.image_index) * (2 if cfg.train.use_flipped else 1)
        indexer = ShuffledIndexer(
            n_index, seed=cfg.rng_seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        streams = ["real"] + (["syn"] * (1 if cfg.train.synthesize else 0))
        sampler = RatioSampler(streams, [1, cfg.train.syn_ratio][: len(streams)])
    else:
        sampler = RatioSampler(["syn"], [1])

    def syn_to_mode(b):
        """Derive DEPTH/RGBD/NORMAL network inputs from the synthetic
        generator's metric depth (ref syn branch minibatch.py:190-241)."""
        if cfg.input == "COLOR":
            return b
        dblob = np.empty(b["depth"].shape + (3,), np.float32)
        for i_im in range(b["depth"].shape[0]):
            d = b["depth"][i_im]
            if cfg.input == "NORMAL":
                nmap = normals_from_depth_np(d, k)
                dblob[i_im] = 127.5 * nmap + 127.5 - pixel_means
            else:
                dblob[i_im] = np.tile(
                    (d / max(float(d.max()), 1e-6) * 255.0)[:, :, None], (1, 1, 3)
                ) - pixel_means
        if cfg.input == "RGBD":
            b["data_p"] = dblob
        else:
            b["data"] = dblob
        return b

    max_gt = 8 * batch_size  # GT rows scale with batch size

    def make_batch():
        if sampler.next_stream() == "real" and have_real:
            return get_real_minibatch(
                ds, indexer.next_batch(batch_size),
                num_classes=c, height=cfg.train.syn_height, width=cfg.train.syn_width,
                pixel_means=pixel_means, input_mode=cfg.input, rng=data_rng,
                chromatic=cfg.train.chromatic, noise=cfg.train.add_noise,
                use_flipped=cfg.train.use_flipped, max_gt=max_gt,
            )
        return syn_to_mode(gen.minibatch(batch_size, max_gt=max_gt))

    def batches():
        while True:
            b = make_batch()
            out = {key: jnp.asarray(v) for key, v in b.items()}
            if mesh is not None:
                bs = batch_sharding(mesh)
                rep = replicated(mesh)
                out = {
                    key: jax.device_put(v, rep if key in ("gt_poses", "gt_valid") else bs)
                    for key, v in out.items()
                }
            yield out

    it = batches()
    sample = next(it)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.rng_seed), sample, jnp.asarray(extents))
    if args.pretrained:
        state = TrainState(
            params=import_vgg16_npy(args.pretrained, state.params),
            opt_state=state.opt_state,
            step=state.step,
        )
    if args.ckpt:
        params, step0 = restore_params(args.ckpt, state.params)
        state = TrainState(params=params, opt_state=state.opt_state, step=jnp.asarray(step0))
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    os.makedirs(args.output, exist_ok=True)
    log_path = os.path.join(args.output, "metrics.jsonl")
    log_f = open(log_path, "a")

    def log_fn(it_num, metrics):
        metrics["iter"] = it_num
        log_f.write(json.dumps(metrics) + "\n")
        log_f.flush()
        line = ", ".join(f"{k}: {v:.4f}" for k, v in metrics.items() if k != "iter")
        print(f"iter {it_num}/{max_iters} " + line, flush=True)

    def snapshot_fn(it_num, st):
        path = snapshot_path(args.output, cfg.train.snapshot_prefix, cfg.train.snapshot_infix, it_num)
        save_params(path, st.params, step=it_num)
        prune_snapshots(args.output, cfg.train.snapshot_prefix, cfg.train.snapshot_keep)
        print(f"snapshot → {path}")

    state = train_loop(
        cfg, model, state, it,
        jnp.asarray(points), jnp.asarray(extents), jnp.asarray(symmetry),
        max_iters=max_iters, mesh=mesh, log_fn=log_fn, snapshot_fn=snapshot_fn,
    )
    final = snapshot_path(args.output, cfg.train.snapshot_prefix, cfg.train.snapshot_infix, max_iters)
    save_params(final, state.params, step=max_iters)
    print(f"done → {final}")


if __name__ == "__main__":
    main()
