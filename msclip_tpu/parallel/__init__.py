from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    mesh_from_config,
    optstate_shardings,
    param_shardings,
    replicated,
    shard_opt_state,
    shard_params,
)
from .infonce import (
    chunked_sharded_infonce_loss,
    infonce_loss,
    ring_infonce_loss,
    sharded_infonce_loss,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "mesh_from_config",
    "optstate_shardings",
    "param_shardings",
    "replicated",
    "shard_opt_state",
    "shard_params",
    "chunked_sharded_infonce_loss",
    "infonce_loss",
    "ring_infonce_loss",
    "sharded_infonce_loss",
]
