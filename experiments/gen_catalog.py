#!/usr/bin/env python
"""Generate the full experiment catalog from the reference inventory.

The reference ships ~84 YAML configs (ref: experiments/cfgs/*.yml) and
~150 launcher scripts (ref: experiments/scripts/*.sh). This tool maps
every one onto this framework's config schema (posecnn_tpu/core/config.py)
and CLI surface, so a reference user finds the same (dataset, modality,
task) grid here:

    python experiments/gen_catalog.py [--ref /root/reference] [--force]

Mapping rules (mechanical; every output is validated through the strict
config overlay before being written):
  * TRAIN./TEST. keys lowercase 1:1 into TrainConfig/TestConfig; the
    legacy ``VERTEX_REG`` alias (older configs) maps to vertex_reg_2d.
  * NETWORK: (absent, SINGLE_FRAME)->posecnn, (absent, video)->
    recurrent_seg, VGG16DET->posecnn_det, FCN8VGG->fcn8,
    VGG16FULL->posecnn (its MATCHING flag selects the matching-loss
    train step), DCGAN->posecnn with train.gan (adversarial step).
  * per-config max_iters comes from the reference launcher's --iters.
  * exp_dir uses the config stem (unique output dirs; the reference
    reuses one EXP_DIR per dataset and disambiguates by imdb only).

Hand-curated YAMLs already present in experiments/cfgs/ are never
overwritten (they carry extra tuning notes); pass --force to regenerate
everything.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, List, Optional, Tuple

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from posecnn_tpu.core.config import cfg_from_dict  # noqa: E402

NETWORK_MAP = {
    None: "posecnn",
    "VGG16DET": "posecnn_det",
    "FCN8VGG": "fcn8",
    "VGG16FULL": "posecnn",
    "DCGAN": "posecnn",
}

# TRAIN/TEST key aliases from older reference configs.
KEY_ALIASES = {"vertex_reg": "vertex_reg_2d"}

# imdb-name prefix -> our dataset registry key (posecnn_tpu/data/datasets.py).
# Longest prefix wins; the remainder of the imdb name is the image_set
# (per-object sets like 004_sugar_box_train resolve inside the dataset).
DATASET_PREFIXES = [
    ("lov_single_", "lov_single"),
    ("lov_", "ycb_video"),
    ("linemod_", "linemod"),
    ("ycb_single_", "ycb_single"),
    ("ycb_", "ycb"),
    ("rgbd_scene_", "rgbd_scene"),
    ("shapenet_scene_", "shapenet_scene"),
    ("shapenet_single_", "shapenet_single"),
    ("gmu_scene_", "gmu_scene"),
    ("sym_", "sym"),
    ("yumi_", "yumi"),
]


def _tuple_constructor(loader, node):
    return list(loader.construct_sequence(node))


class _RefLoader(yaml.SafeLoader):
    pass


_RefLoader.add_constructor("tag:yaml.org,2002:python/tuple", _tuple_constructor)


def load_ref_cfg(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=_RefLoader) or {}


def parse_scripts(scripts_dir: str) -> Dict[str, dict]:
    """Extract (cfg stem -> imdb/iters/role) from the reference launchers."""
    table: Dict[str, dict] = {}
    for name in sorted(os.listdir(scripts_dir)):
        if not name.endswith(".sh"):
            continue
        text = open(os.path.join(scripts_dir, name)).read()
        m_cfg = re.search(r"cfgs/([a-z0-9_]+)\.yml", text)
        m_imdb = re.search(r"--imdb\s+([A-Za-z0-9_]+)", text)
        if not (m_cfg and m_imdb):
            continue
        stem = m_cfg.group(1)
        m_iters = re.search(r"^\s*--iters\s+(\d+)", text, re.M)
        entry = table.setdefault(stem, {})
        role = "test" if ("test" in name or "demo" in name) else "train"
        info = {"imdb": m_imdb.group(1), "script": name}
        if m_iters:
            info["iters"] = int(m_iters.group(1))
        # first launcher of each role wins (later ones are ros/demo dups)
        entry.setdefault(role, info)
    return table


def split_imdb(imdb: str) -> Tuple[str, str]:
    for prefix, dataset in DATASET_PREFIXES:
        if imdb.startswith(prefix):
            return dataset, imdb[len(prefix):]
    return "synthetic", imdb


def convert(ref: dict, stem: str, iters: Optional[int]) -> dict:
    """Reference-schema dict -> our-schema dict (strictly validated)."""
    out: dict = {"exp_dir": stem}
    train: dict = {}
    test: dict = {}
    single_frame = bool(ref.get("TRAIN", {}).get("SINGLE_FRAME", True))
    net = ref.get("NETWORK")
    if net in NETWORK_MAP:
        out["network"] = NETWORK_MAP[net]
    elif net is None:
        out["network"] = "posecnn"
    else:
        raise ValueError(f"{stem}: unknown reference NETWORK {net!r}")
    if net is None and not single_frame:
        out["network"] = "recurrent_seg"

    for key, value in ref.items():
        if key in ("TRAIN", "TEST", "NETWORK", "EXP_DIR"):
            continue
        out[key.lower()] = value
    num_re = re.compile(r"^-?\d+(\.\d*)?([eE][-+]?\d+)?$")
    for section, dst in (("TRAIN", train), ("TEST", test)):
        for key, value in ref.get(section, {}).items():
            norm = key.lower()
            # YAML 1.1 reads '1e-4'-style literals as strings; the
            # reference's easydict coerced them downstream — do it here.
            if isinstance(value, str) and num_re.match(value):
                value = float(value)
            dst[KEY_ALIASES.get(norm, norm)] = value
    if iters:
        train["max_iters"] = iters
    if train:
        out["train"] = train
    if test:
        out["test"] = test
    cfg_from_dict(out)  # strict validation; raises on any mismatch
    return out


def dump_yaml(out: dict, stem: str, src_rel: str) -> str:
    lines = [
        f"# Generated by experiments/gen_catalog.py from the reference",
        f"# experiment catalog entry {src_rel} — same hyperparameters,",
        f"# keys mapped onto posecnn_tpu/core/config.py. Edit freely;",
        f"# regeneration never overwrites an existing file.",
    ]
    def fmt(key: str, value) -> str:
        if isinstance(value, (list, tuple)):
            return f"{key}: [{', '.join(str(v) for v in value)}]"
        if isinstance(value, bool):
            return f"{key}: {str(value).lower()}"
        if isinstance(value, str):
            return yaml.safe_dump({key: value}, default_flow_style=False).strip()
        if isinstance(value, float):
            s = repr(value)
            # YAML 1.1 floats need a dot: '1e-05' would read back as str
            if "e" in s and "." not in s.split("e")[0]:
                s = s.replace("e", ".0e")
            return f"{key}: {s}"
        return f"{key}: {value}"

    order = ["network", "input", "exp_dir", "anchor_scales", "anchor_ratios"]
    for key in order:
        if key in out:
            lines.append(fmt(key, out[key]))
    for section in ("train", "test"):
        if section not in out:
            continue
        lines.append(f"{section}:")
        for key, value in out[section].items():
            lines.append(f"  {fmt(key, value)}")
    return "\n".join(lines) + "\n"


SCRIPT_TEMPLATE = """#!/bin/bash
# {title}
# (generated by experiments/gen_catalog.py from the reference launcher
#  experiments/scripts/{ref_script})
set -e
cd "$(dirname "$0")/../.."
LOG="experiments/logs/{name}.$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")

python -m posecnn_tpu.cli.{module} \\
  --cfg experiments/cfgs/{stem}.yaml \\
  --dataset {dataset} \\
  --image_set {image_set} \\
  --output output/{out_name} \\
  "$@"
"""


def emit_script(path: str, *, module: str, stem: str, imdb: str,
                ref_script: str, force: bool) -> bool:
    if os.path.exists(path) and not force:
        return False
    dataset, image_set = split_imdb(imdb)
    name = os.path.splitext(os.path.basename(path))[0]
    body = SCRIPT_TEMPLATE.format(
        title=f"{stem} {'evaluation' if module == 'test_net' else 'training'}",
        ref_script=ref_script,
        name=name,
        module=module,
        stem=stem,
        dataset=dataset,
        image_set=image_set or "train",
        out_name=name,
    )
    with open(path, "w") as f:
        f.write(body)
    os.chmod(path, 0o755)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--force", action="store_true",
                    help="overwrite existing generated files")
    args = ap.parse_args()

    ref_cfgs = os.path.join(args.ref, "experiments", "cfgs")
    ref_scripts = os.path.join(args.ref, "experiments", "scripts")
    out_cfgs = os.path.join(REPO, "experiments", "cfgs")
    out_scripts = os.path.join(REPO, "experiments", "scripts")
    os.makedirs(out_cfgs, exist_ok=True)
    os.makedirs(out_scripts, exist_ok=True)

    launchers = parse_scripts(ref_scripts)
    n_cfg = n_script = n_skip = 0
    for fname in sorted(os.listdir(ref_cfgs)):
        if not fname.endswith(".yml"):
            continue
        stem = fname[:-4]
        entry = launchers.get(stem, {})
        iters = entry.get("train", {}).get("iters")
        ref = load_ref_cfg(os.path.join(ref_cfgs, fname))
        out = convert(ref, stem, iters)

        dst = os.path.join(out_cfgs, stem + ".yaml")
        if os.path.exists(dst) and not args.force:
            n_skip += 1
        else:
            with open(dst, "w") as f:
                f.write(dump_yaml(out, stem, f"experiments/cfgs/{fname}"))
            n_cfg += 1

        for role, module in (("train", "train_net"), ("test", "test_net")):
            info = entry.get(role)
            if not info:
                continue
            spath = os.path.join(out_scripts, f"{stem}_{role}.sh")
            if emit_script(spath, module=module, stem=stem, imdb=info["imdb"],
                           ref_script=info["script"], force=args.force):
                n_script += 1

    print(f"catalog: wrote {n_cfg} cfgs (+{n_skip} curated kept), "
          f"{n_script} launcher scripts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
