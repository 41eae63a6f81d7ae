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


def save_params(path: str, params: Any, step: int = 0, meta: Optional[dict] = None):
    """meta: small architecture flags that change the forward pass
    WITHOUT changing parameter shapes (e.g. the pose head's
    norm_features / quat_activation) — stored as __meta_<key>__ so
    eval/serve can adopt them instead of silently evaluating a
    checkpoint under the wrong computation (advisor r4)."""
    flat = _flatten(jax.device_get(params))
    flat["__step__"] = np.asarray(step)
    for k, v in (meta or {}).items():
        flat[f"__meta_{k}__"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def read_ckpt_meta(path: str) -> dict:
    """Architecture flags recorded by save_params(meta=...). Empty for
    pre-r6 checkpoints (callers should warn and fall back to cfg)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    out = {}
    for key in data.files:
        m = re.fullmatch(r"__meta_(.+)__", key)
        if m:
            v = data[key]
            out[m.group(1)] = v.item() if v.ndim == 0 else v
    return out


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

def import_vgg16_npy(npy_path: str, params: Any, trunk_scope: str = "VGG16Trunk_0") -> Any:
    """Load reference-format vgg16.npy weights into the flax model.

    Reference .npy dict: {layer_name: {'weights': array, 'biases': (O,)}}
    with conv weights in HWIO and fc weights as (in, out) — TF layout,
    which flax Conv/Dense use natively. The reference loader assigns
    EVERY variable whose scope name and shape match, including
    fc6 (25088×4096) and fc7 (4096×4096) into the pose head
    (network.py:71-107; demo restores them — the RoI pool is 7×7×512
    = 25088, exactly VGG's fc6 input, vgg16_convs.py:178,188). The
    flattening order matches: TF reshapes the (R,7,7,512) pool
    C-order, as does PoseHead (models/posecnn.py). fc8 (ImageNet's
    1000-way classifier) fails the shape check against 4·C and is
    skipped, like the reference's ignore_missing/ValueError path.
    `_p` tower aliases (network.py:91-100) are unnecessary here: the
    dual tower shares weights by construction.
    """
    data = np.load(npy_path, allow_pickle=True, encoding="latin1").item()
    flat = _flatten(jax.device_get(params))
    updated = dict(flat)
    n_kernels = 0
    loaded_names = []
    for name, entry in data.items():
        if "weights" not in entry:
            continue
        w = np.asarray(entry["weights"], np.float32)
        b = np.asarray(entry.get("biases", np.zeros(0)), np.float32).reshape(-1)
        hit = False
        for key in flat:
            if key.endswith(f"{name}/kernel") and flat[key].shape == w.shape:
                updated[key] = w
                n_kernels += 1
                hit = True
            if key.endswith(f"{name}/bias") and flat[key].shape == b.shape:
                updated[key] = b
        if hit:
            loaded_names.append(name)
    print(
        f"import_vgg16_npy: loaded {n_kernels} kernels "
        f"({', '.join(sorted(loaded_names))})"
    )

    def lookup(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return jnp.asarray(updated[key]) if key in updated else leaf

    return jax.tree_util.tree_map_with_path(lookup, params)
