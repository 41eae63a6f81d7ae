from posecnn_tpu.data.minibatch import (
    build_meta_blob,
    build_pose_blob,
    generate_vertex_targets,
    label_to_boxes,
    pad_image_blob,
)
from posecnn_tpu.data.synthetic import (
    SyntheticSceneGenerator,
    SyntheticSequenceGenerator,
)
from posecnn_tpu.data.pipeline import (
    Prefetcher,
    RatioSampler,
    ShuffledIndexer,
    make_sharded_device_put,
)
from posecnn_tpu.data.augment import add_noise, chromatic_transform
from posecnn_tpu.data.shards import ShardReader, write_shards
from posecnn_tpu.data import datasets  # registers the dataset catalog
from posecnn_tpu.core.registry import DATASETS

__all__ = [
    "generate_vertex_targets",
    "build_meta_blob",
    "build_pose_blob",
    "label_to_boxes",
    "pad_image_blob",
    "SyntheticSceneGenerator",
    "SyntheticSequenceGenerator",
    "Prefetcher",
    "RatioSampler",
    "ShuffledIndexer",
    "make_sharded_device_put",
    "chromatic_transform",
    "add_noise",
    "ShardReader",
    "write_shards",
    "datasets",
    "DATASETS",
]
