from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    fsdp_param_shardings,
    mesh_from_config,
    optstate_shardings,
    param_shardings,
    replicated,
    shard_opt_state,
    shard_params,
    shard_params_fsdp,
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
    "fsdp_param_shardings",
    "mesh_from_config",
    "optstate_shardings",
    "param_shardings",
    "replicated",
    "shard_opt_state",
    "shard_params",
    "shard_params_fsdp",
    "chunked_sharded_infonce_loss",
    "infonce_loss",
    "ring_infonce_loss",
    "sharded_infonce_loss",
]
