"""Shared CLI plumbing (ref: argparse patterns of tools/train_net.py:26-70,
tools/test_net.py, tools/demo.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from posecnn_tpu.core.config import Config, cfg_from_dict, cfg_from_file


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg", dest="cfg_file", default=None, help="config YAML (ref --cfg)")
    p.add_argument("--device", default=None, help="jax platform override (cpu/tpu)")
    p.add_argument("--rand", action="store_true", help="do not fix the rng seed")
    p.add_argument(
        "--set",
        dest="set_cfgs",
        nargs="*",
        default=[],
        help="config overrides key=value (dots for nesting)",
    )
    return p


def load_config(args) -> Config:
    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    overrides: dict = {}
    for kv in args.set_cfgs:
        key, _, value = kv.partition("=")
        node = overrides
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        import yaml

        node[parts[-1]] = yaml.safe_load(value)
    if overrides:
        cfg = cfg_from_dict(overrides, base=cfg)
    return cfg


def setup_device(args):
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    # persistent compilation cache: big train graphs take minutes to
    # compile (especially over the remote-compile tunnel); cache them
    try:
        cache_dir = os.environ.get("POSECNN_JAX_CACHE", "/tmp/posecnn_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def class_data_from_dataset(ds, num_points: int):
    points = ds.subsampled_points(num_points) if hasattr(ds, "subsampled_points") else None
    return points, ds.extents if hasattr(ds, "extents") else None, np.asarray(ds.symmetry)


def head_flags_from_ckpt(cfg, ckpt_path):
    """Pose-head construction flags for eval/serve/demo, ADOPTED from
    the checkpoint's recorded metadata when present.

    norm_features / quat_activation / pose_pool_size change the
    forward computation at identical parameter shapes, so a checkpoint
    trained under one setting loads silently under another and
    produces wrong poses with no error (advisor r4). Training records
    them per snapshot (core/checkpoint.save_params meta=...); here
    they override the cfg so the eval computation always matches the
    trained one. Pre-metadata checkpoints fall back to cfg with a
    warning."""
    flags = {
        "norm_features": bool(cfg.train.norm_features),
        "quat_activation": str(cfg.train.quat_activation),
        "pose_pool_size": int(cfg.train.pose_pool_size),
    }
    if not ckpt_path:
        return flags
    from posecnn_tpu.core.checkpoint import read_ckpt_meta

    meta = read_ckpt_meta(ckpt_path)
    if not meta:
        print(
            "WARNING: checkpoint records no head metadata (pre-r6 "
            f"snapshot); trusting cfg head flags {flags} — results are "
            "wrong if the checkpoint was trained under different ones"
        )
        return flags
    for k, cur in flags.items():
        if k not in meta:
            continue
        v = type(cur)(meta[k])
        if v != cur:
            print(f"checkpoint head flag {k}={v!r} overrides cfg {cur!r}")
        flags[k] = v
    return flags


def data_flags_from_ckpt(cfg, ckpt_path):
    """Synthetic-data appearance flags (orient_paint / paint_version)
    ADOPTED from the checkpoint's recorded metadata when present.

    These change the rendered appearance of the procedural class
    library, so evaluating a checkpoint under a different paint than it
    was trained with silently degrades pose accuracy (the same failure
    mode head_flags_from_ckpt guards for the model computation, on the
    data side). Returns a dict usable as
    colorize_model_library/fill_missing_points kwargs."""
    flags = {
        "orient_detail": bool(cfg.train.orient_paint),
        "paint_version": int(getattr(cfg.train, "paint_version", 3)),
    }
    if not ckpt_path:
        return flags
    from posecnn_tpu.core.checkpoint import read_ckpt_meta

    meta = read_ckpt_meta(ckpt_path)
    for src, dst in (("orient_paint", "orient_detail"), ("paint_version", "paint_version")):
        if meta and src in meta:
            v = type(flags[dst])(meta[src])
            if v != flags[dst]:
                print(f"checkpoint data flag {src}={v!r} overrides cfg {flags[dst]!r}")
            flags[dst] = v
    return flags
