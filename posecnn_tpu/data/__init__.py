from posecnn_tpu.data.minibatch import generate_vertex_targets, build_meta_blob
from posecnn_tpu.data.synthetic import SyntheticSceneGenerator

__all__ = [
    "generate_vertex_targets",
    "build_meta_blob",
    "SyntheticSceneGenerator",
]
