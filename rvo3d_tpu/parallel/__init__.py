from rvo3d_tpu.parallel.mesh import make_mesh
from rvo3d_tpu.parallel.multihost import (
    distributed_init_from_env, global_replicate, global_shard_carry,
    is_coordinator,
)
from rvo3d_tpu.parallel.sharding import (
    replicate, shard_carry, shard_params_tp, data_sharding
)

__all__ = [
    "make_mesh", "replicate", "shard_carry", "shard_params_tp",
    "data_sharding", "distributed_init_from_env", "global_shard_carry",
    "global_replicate", "is_coordinator",
]
