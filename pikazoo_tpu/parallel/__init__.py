from pikazoo_tpu.parallel.mesh import (env_sharding, init_distributed,
                                       make_env_mesh, replicated_sharding,
                                       shard_batch)

__all__ = [
    "make_env_mesh",
    "env_sharding",
    "replicated_sharding",
    "shard_batch",
    "init_distributed",
]
