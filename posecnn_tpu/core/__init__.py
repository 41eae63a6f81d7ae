from posecnn_tpu.core.config import (
    Config,
    ParallelConfig,
    TestConfig,
    TrainConfig,
    cfg_from_dict,
    cfg_from_file,
    cfg_to_dict,
    get_output_dir,
)
from posecnn_tpu.core.registry import Registry

__all__ = [
    "Config",
    "TrainConfig",
    "TestConfig",
    "ParallelConfig",
    "cfg_from_file",
    "cfg_from_dict",
    "cfg_to_dict",
    "get_output_dir",
    "Registry",
]
