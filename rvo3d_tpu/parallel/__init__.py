from rvo3d_tpu.parallel.mesh import make_mesh
from rvo3d_tpu.parallel.sharding import (
    replicate, shard_carry, shard_params_tp, data_sharding
)

__all__ = [
    "make_mesh", "replicate", "shard_carry", "shard_params_tp",
    "data_sharding",
]
