from parakeet_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
)

__all__ = ["make_mesh", "param_sharding_rules", "shard_params", "batch_sharding"]
