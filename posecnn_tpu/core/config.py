"""Layered configuration tree: typed dataclasses + strict YAML overlay.

TPU-native replacement for the reference's easydict config system
(ref: lib/fcn/config.py:26-305). Same layering — in-code defaults,
YAML override file, programmatic overrides — with the same strictness:
unknown keys and type mismatches raise, mirroring `_merge_a_into_b`
(ref: lib/fcn/config.py:271-296).

Every TRAIN.*/TEST.* feature gate of the reference has an equivalent
field here; names are kept recognizable (snake_case) so experiment
YAMLs translate mechanically.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, replace
from typing import Any, Optional, Tuple

try:  # pyyaml is part of the baked image (transitively); gate anyway.
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover
    _HAS_YAML = False


@dataclass(frozen=True)
class TrainConfig:
    """Training options (ref: lib/fcn/config.py:52-178)."""

    # loss gates / weights
    single_frame: bool = True
    segmentation: bool = True
    vertex_reg_2d: bool = False
    vertex_reg_3d: bool = False
    pose_reg: bool = False
    adapt: bool = False
    matching: bool = False
    gan: bool = False
    trainable: bool = True
    label_w: float = 1.0
    vertex_w: float = 5.0
    vertex_w_inside: float = 10.0
    pose_w: float = 1.0
    adapt_weight: float = 0.1
    gan_weight: float = 0.1  # adversarial term weight (vgg16_gan variant)
    weight_reg: float = 0.0001
    threshold_label: float = 1.0
    voting_threshold: float = -1.0
    hard_angle: float = 15.0

    # optimizer / schedule (ref: config.py:97-103, train.py:529-534)
    optimizer: str = "momentum"
    learning_rate: float = 0.001
    momentum: float = 0.9
    gamma: float = 0.1
    stepsize: int = 30000
    grad_clip: float = 0.0  # 0 = off; new capability, off by default

    # batch / steps
    ims_per_batch: int = 2
    num_steps: int = 5  # video unroll length (ref: config.py:117)
    num_units: int = 64
    fc_dim: int = 4096  # fc6/fc7 width (ref: vgg16_convs.py:188-191)
    num_classes: int = 10
    max_iters: int = 40000

    # data augmentation (ref: config.py:108-112)
    chromatic: bool = True
    add_noise: bool = False
    use_flipped: bool = False
    scales_base: Tuple[float, ...] = (1.0,)  # train-time rescale (ref: config.py:109)

    # synthetic data mixing (ref: config.py:74-88)
    synthesize: bool = False
    syn_online: bool = False
    syn_width: int = 640
    syn_height: int = 480
    synroot: str = ""
    synnum: int = 80000
    syn_ratio: int = 1
    syn_tnear: float = 0.5
    syn_tfar: float = 2.0
    # single-class synthesis: -1 = all classes, N>0 = only class N
    # (ref: config.py:84 SYN_CLASS_INDEX, used by per-object configs)
    syn_class_index: int = -1
    syn_sample_object: bool = True  # (ref: config.py:87)
    syn_sample_pose: bool = False  # (ref: config.py:88)
    # octant-ramp + fine-checker paint components that make object
    # orientation unambiguously observable in the procedural renders
    # (r4 rotation diagnosis, docs/BENCH_NOTES.md). Off by default:
    # appearance is part of a checkpoint's data contract — train, eval
    # and demo must all agree (no reference equivalent; the YCB meshes
    # it renders are textured, synthesize.cpp:319-383).
    orient_paint: bool = False
    paint_version: int = 3  # orientation-marker paint revision (procedural.apply_orient_markers)
    symsize: int = 0  # (ref: config.py:103)
    adapt_root: str = ""
    adapt_num: int = 400
    adapt_ratio: int = 1

    # snapshotting (ref: config.py:122-131)
    snapshot_iters: int = 10000
    snapshot_prefix: str = "posecnn"
    snapshot_infix: str = ""
    snapshot_keep: int = 12
    display: int = 20
    # planned-handoff guard (no reference equivalent): snapshot and
    # exit cleanly when host RSS exceeds this many GB, instead of
    # being OOM-killed mid-pass and losing work since the last
    # snapshot. 0 disables. Exists because this environment's tunnel
    # PJRT client leaks transfer buffers (~12 MB/iter at the 480×640
    # sparse feed); resume via train_net --resume continues exactly.
    max_host_rss_gb: float = 0.0

    # voxel grid (ref: config.py:106)
    grid_size: int = 256

    # detection-variant RoI sampling / RPN hyperparameters
    # (ref: config.py:135-199)
    bg_thresh_lo: float = 0.1  # (ref :149)
    batch_size: int = 128  # RoIs sampled per image (ref :138)
    fg_fraction: float = 0.25  # (ref :141)
    fg_thresh: float = 0.5  # (ref :144)
    bg_thresh_hi: float = 0.5  # (ref :148)
    rpn_positive_overlap: float = 0.7  # (ref :156)
    rpn_negative_overlap: float = 0.3  # (ref :159)
    rpn_clobber_positives: bool = False  # (ref :162)
    rpn_fg_fraction: float = 0.5  # (ref :165)
    rpn_batchsize: int = 256  # (ref :168)
    rpn_nms_thresh: float = 0.7  # (ref :171)
    rpn_pre_nms_top_n: int = 2000  # (ref :174 uses 12000; static-shape
    # top-k makes a smaller pool the TPU default — override via YAML)
    rpn_post_nms_top_n: int = 128  # (ref :177 uses 2000 then samples
    # BATCH_SIZE=128; here the proposal pool is the RoI slot budget)
    bbox_normalize_targets: bool = True  # (ref :188,195)
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)  # (ref :197)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)  # (ref :199)

    # fixed-size buffers for static XLA shapes (new, TPU-first)
    max_rois: int = 128  # MAX_ROI (ref: hough_voting_gpu_op.cc:32)
    # static pose-head row budget (0 = off): compact the padded Hough
    # rows to the top-K by validity before RoI pooling / fc6-fc7
    # (models/posecnn.py max_pose_rois) — same truncation semantics as
    # the reference's MAX_ROI emission cap
    max_pose_rois: int = 0
    # training-schedule extension (off by default): prepend one exact
    # GT RoI per object so the quaternion head gets dense supervision
    # from iter 0 instead of waiting for Hough detections to GT-match
    # (ops/hough_voting.append_gt_rois)
    gt_pose_rois: bool = False
    # pose-head RoI pooling grid (ref pools 7×7, vgg16_convs.py:177-183;
    # 14 doubles the pooled angular resolution — r4 verdict task 3a)
    pose_pool_size: int = 7
    # pose-head forward semantics (models/posecnn.py PoseHead): both
    # change the computation without changing parameter shapes, so they
    # are recorded in snapshot metadata (core/checkpoint.save_params)
    # and ADOPTED from the checkpoint by eval/serve/demo — a checkpoint
    # trained under one setting would otherwise load silently under
    # another and produce wrong poses (advisor r4). "tanh" + False is
    # the reference-parity mode (vgg16_convs.py:195-197).
    norm_features: bool = True
    quat_activation: str = "linear"
    # (|q_raw|-1)^2 magnitude regularizer weight for the linear
    # quaternion head (engine/train.py; 0 disables)
    qmag_w: float = 0.1
    # synthetic-scene replay pool (data/synthetic.pooled_minibatch;
    # 0 = reference behavior, every frame fresh): on few-core hosts
    # scene rendering caps the sample rate at ~batch-2 while the TPU
    # step is ~free — the pool serves device batches of 16-32 at the
    # host cost of syn_pool_fresh renders/step (per prefetch worker)
    syn_pool_size: int = 0
    syn_pool_fresh: int = 2
    # resume lr alignment: set (by the train_net resume path) to the
    # restored global step so the staircase schedule — evaluated on the
    # optimizer's pass-local count, which deliberately resets at every
    # resume for the adam restart kick (engine/train.lr_schedule) —
    # keeps its decay boundaries at the intended global iterations
    lr_step_offset: int = 0
    # tunnel-feed compression (data/pipeline.compact_feed →
    # engine/train.decompress_feed): uint8 image/label + depth dropped
    # for the synthetic COLOR path — ~6× less host→device volume and
    # proportionally less tunnel-PJRT leak per iter (train_chunked.sh)
    compact_feed: bool = True
    # hough backend override (models/posecnn.py): "auto" picks the
    # pallas c2f kernel on TPU; "xla" is the fallback for batch/shape
    # combinations the Mosaic compiler rejects (observed at batch 16)
    hough_backend: str = "auto"
    hough_num_samples: int = 256  # per-class voting pixels after subsampling
    add_num_points: int = 512  # model points used by the ADD loss
    visualize: bool = False


@dataclass(frozen=True)
class TestConfig:
    """Test-time options (ref: lib/fcn/config.py:180-240)."""

    single_frame: bool = True
    segmentation: bool = True
    vertex_reg_2d: bool = False
    vertex_reg_3d: bool = False
    pose_reg: bool = False
    pose_refine: bool = False
    visualize: bool = False
    ransac: bool = False
    gan: bool = False
    matching: bool = False  # matching-loss eval (ref: vgg16_full configs)
    voting_threshold: float = -1.0  # hough vote gate (ref: config.py:233)
    scales_base: Tuple[float, ...] = (1.0,)
    synthetic: bool = False  # evaluate on synthetic frames (ref: config.py:215)
    grid_size: int = 256  # test-time voxel grid (ref: config.py:216 area)
    hough_skip_pixels: int = 10
    hough_num_samples: int = 1024
    nms_threshold: float = 0.5
    icp_iters: int = 8
    icp_hypotheses: int = 8
    # rotation-hypothesis sweep half-angle in radians (0 = off): the
    # derivative-free rotation polish standing in for the reference's
    # NLopt Nelder-Mead pose polish (synthesize.cpp:2172-2199)
    icp_rot_perturb: float = 0.0
    # detection-variant test knobs (ref: config.py:225-238)
    rpn_nms_thresh: float = 0.7  # (ref :225)
    rpn_pre_nms_top_n: int = 2000  # (ref :228 uses 6000; see train note)
    rpn_post_nms_top_n: int = 128  # (ref :231 uses 300)
    bbox_reg: bool = True  # decode per-class box deltas (ref :234)


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh / sharding options — new (no reference equivalent;
    the reference is single-GPU, SURVEY.md §2.4)."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1 = all devices
    num_model: int = 1
    shard_fc: bool = False  # tensor-parallel fc6/fc7 over 'model'
    remat_trunk: bool = False  # jax.checkpoint over the VGG trunk


@dataclass(frozen=True)
class Config:
    """Root config (ref: lib/fcn/config.py global keys :31-49)."""

    network: str = "posecnn"  # ref NETWORK 'VGG16' -> model registry key
    input: str = "COLOR"  # COLOR | RGBD | DEPTH | NORMAL
    flip_x: bool = False
    exp_dir: str = "default"
    rig: str = ""
    cad: str = ""
    pose: str = ""
    background: str = ""
    feature_stride: int = 16
    anchor_scales: Tuple[int, ...] = (8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # Pixel means in BGR order, matching the reference's caffe heritage
    # (ref: lib/fcn/config.py PIXEL_MEANS) so .npy weight imports line up.
    pixel_means: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)
    rng_seed: int = 3
    eps: float = 1e-14
    compute_dtype: str = "bfloat16"  # MXU-native compute; params stay fp32
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)


def _coerce(value: Any, target_type: Any, key: str) -> Any:
    """Coerce a YAML scalar/list into the dataclass field type, strictly."""
    import typing

    origin = typing.get_origin(target_type)
    if origin in (tuple, Tuple):
        if not isinstance(value, (list, tuple)):
            raise TypeError(f"config key '{key}': expected sequence, got {type(value).__name__}")
        args = typing.get_args(target_type)
        if args and args[-1] is Ellipsis:
            elem_t = args[0]
            return tuple(_coerce(v, elem_t, f"{key}[{i}]") for i, v in enumerate(value))
        if args:
            if len(value) != len(args):
                raise TypeError(
                    f"config key '{key}': expected {len(args)} elements, got {len(value)}"
                )
            return tuple(
                _coerce(v, t, f"{key}[{i}]") for i, (v, t) in enumerate(zip(value, args))
            )
        return tuple(value)
    if target_type is float and isinstance(value, int):
        return float(value)
    if target_type is bool:
        if not isinstance(value, bool):
            raise TypeError(f"config key '{key}': expected bool, got {type(value).__name__}")
        return value
    if target_type is int and isinstance(value, bool):
        raise TypeError(f"config key '{key}': expected int, got bool")
    if target_type in (int, float, str) and not isinstance(value, target_type):
        raise TypeError(
            f"config key '{key}': expected {target_type.__name__}, got {type(value).__name__}"
        )
    return value


def _merge_into(cfg: Any, overrides: dict, prefix: str = "") -> Any:
    """Strict recursive merge of a dict into a dataclass (ref semantics:
    lib/fcn/config.py:271-296 — unknown key or type mismatch raises)."""
    if not dataclasses.is_dataclass(cfg):
        raise TypeError(f"cannot merge into non-dataclass at '{prefix}'")
    import typing

    # `from __future__ import annotations` makes f.type a STRING;
    # resolve to real types so the tuple/scalar checks actually fire
    hints = typing.get_type_hints(type(cfg))
    field_map = {f.name: f for f in fields(cfg)}
    updates = {}
    for key, value in overrides.items():
        norm = key.lower()
        if norm not in field_map:
            raise KeyError(f"unknown config key: '{prefix}{key}'")
        current = getattr(cfg, norm)
        if dataclasses.is_dataclass(current):
            if not isinstance(value, dict):
                raise TypeError(f"config key '{prefix}{key}' is a section, got scalar")
            updates[norm] = _merge_into(current, value, prefix=f"{prefix}{key}.")
        else:
            updates[norm] = _coerce(
                value, hints.get(norm, type(current)), f"{prefix}{key}"
            )
    return replace(cfg, **updates)


def cfg_from_file(path: str, base: Optional[Config] = None) -> Config:
    """Load a YAML override file on top of defaults
    (ref: cfg_from_file lib/fcn/config.py:299-305)."""
    if not _HAS_YAML:
        raise RuntimeError("pyyaml unavailable; use cfg_from_dict with json")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _merge_into(base or Config(), raw)


def cfg_from_dict(overrides: dict, base: Optional[Config] = None) -> Config:
    return _merge_into(base or Config(), overrides)


def cfg_to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)


def cfg_to_json(cfg: Config) -> str:
    return json.dumps(cfg_to_dict(cfg), indent=2, default=str)


def get_output_dir(cfg: Config, imdb_name: str, root: str = "output") -> str:
    """Output directory layout <root>/<exp_dir>/<imdb>
    (ref: get_output_dir lib/fcn/config.py:259-269)."""
    import os

    path = os.path.join(root, cfg.exp_dir, imdb_name)
    os.makedirs(path, exist_ok=True)
    return path
