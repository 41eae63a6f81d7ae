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
