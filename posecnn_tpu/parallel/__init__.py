from posecnn_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_sharding,
    replicated,
)

__all__ = ["create_mesh", "batch_sharding", "param_sharding", "replicated"]
