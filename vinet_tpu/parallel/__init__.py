from vinet_tpu.parallel.mesh import create_mesh, batch_sharding, replicate
from vinet_tpu.parallel.partition import param_partition_specs, shard_pytree

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate",
    "param_partition_specs",
    "shard_pytree",
]
