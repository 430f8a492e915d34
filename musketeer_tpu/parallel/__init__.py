from .mesh import (
    DATA, FSDP, MODEL, batch_sharding, batch_spec, make_mesh, param_shardings,
    param_spec, replicated, shard_params,
)

__all__ = [
    "DATA", "FSDP", "MODEL", "batch_sharding", "batch_spec", "make_mesh",
    "param_shardings", "param_spec", "replicated", "shard_params",
]
