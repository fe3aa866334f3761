from pacednegatives_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_batch",
]
