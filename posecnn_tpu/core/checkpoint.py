"""Checkpointing with shape-tolerant restore + Caffe .npy import.

Replaces the reference's tf.train.Saver snapshot/restore machinery
(ref: lib/fcn/train.py:28-91): snapshots named
<prefix>[_<infix>]_iter_N under the output dir, keep the last K, and
restore FILTERS BY NAME+SHAPE MATCH reporting ignored entries — the
same behavior that lets the reference finetune across head-config
changes (ref: SolverWrapper.restore train.py:58-91).

Format: a single .npz of flattened "a/b/c" keys (portable, no orbax
dependency); optimizer state and step stored alongside params.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path: str, params: Any, step: int = 0):
    flat = _flatten(jax.device_get(params))
    flat["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def restore_params(path: str, params_template: Any, verbose: bool = True) -> Tuple[Any, int]:
    """Load a checkpoint into the template pytree, keeping template
    values where the name is missing or the shape mismatches
    (ref: train.py:58-91 name+shape filtered restore)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat_t = _flatten(jax.device_get(params_template))
    restored, ignored = {}, []
    for key, tval in flat_t.items():
        if key in data and data[key].shape == tval.shape:
            restored[key] = data[key].astype(tval.dtype)
        else:
            restored[key] = tval
            if key in data:
                ignored.append(f"{key} (shape {data[key].shape} vs {tval.shape})")
            else:
                ignored.append(f"{key} (missing)")
    if verbose and ignored:
        print(f"restore: kept template for {len(ignored)} entries:")
        for line in ignored[:20]:
            print("  ", line)
    step = int(data["__step__"]) if "__step__" in data else 0
    # unflatten back into the template structure
    leaves_t, treedef = jax.tree_util.tree_flatten(params_template)
    flat_keys = sorted(flat_t.keys())
    # rebuild using tree_map over path
    def lookup(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return jnp.asarray(restored[key]) if key in restored else leaf

    return jax.tree_util.tree_map_with_path(lookup, params_template), step


def snapshot_path(output_dir: str, prefix: str, infix: str, iteration: int) -> str:
    """<prefix>[_<infix>]_iter_N naming (ref: train.py:41-56)."""
    name = prefix + (f"_{infix}" if infix else "") + f"_iter_{iteration}.npz"
    return os.path.join(output_dir, name)


def prune_snapshots(output_dir: str, prefix: str, keep: int = 12):
    """Keep the newest `keep` snapshots (ref: Saver max_to_keep=12,
    train.py:38)."""
    pat = re.compile(re.escape(prefix) + r".*_iter_(\d+)\.npz$")
    found = []
    for f in os.listdir(output_dir):
        mobj = pat.match(f)
        if mobj:
            found.append((int(mobj.group(1)), f))
    for _, f in sorted(found)[:-keep]:
        os.remove(os.path.join(output_dir, f))


# ---------------------------------------------------------------------------
# Caffe-exported VGG16 .npy import (ref: Network.load network.py:71-107)
# ---------------------------------------------------------------------------

# reference .npy dict: {layer_name: {'weights': HWIO array, 'biases': (O,)}}
_VGG_CONV_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]


def import_vgg16_npy(npy_path: str, params: Any, trunk_scope: str = "VGG16Trunk_0") -> Any:
    """Load reference-format vgg16.npy weights into the flax trunk.

    The reference loader aliases `_p` tower names to shared weights
    (network.py:91-100); our dual tower shares by construction so only
    the base names are needed. fc6/fc7 ImageNet weights are shape-
    incompatible with the pose head (different input dims) and are
    skipped, as the reference's shape check also skips them.
    """
    data = np.load(npy_path, allow_pickle=True, encoding="latin1").item()
    flat = _flatten(jax.device_get(params))
    updated = dict(flat)
    n_loaded = 0
    for name in _VGG_CONV_NAMES:
        if name not in data:
            continue
        w = np.asarray(data[name]["weights"], np.float32)  # HWIO
        b = np.asarray(data[name]["biases"], np.float32).reshape(-1)
        for key in flat:
            if key.endswith(f"{name}/kernel") and flat[key].shape == w.shape:
                updated[key] = w
                n_loaded += 1
            if key.endswith(f"{name}/bias") and flat[key].shape == b.shape:
                updated[key] = b
    print(f"import_vgg16_npy: loaded {n_loaded} conv kernels")

    def lookup(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return jnp.asarray(updated[key]) if key in updated else leaf

    return jax.tree_util.tree_map_with_path(lookup, params)
