from parakeet_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
)
from parakeet_tpu.parallel.pipeline import (
    make_pp_trainer,
    merge_layer_params,
    pipeline_encode,
    split_layer_params,
)

__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "batch_sharding",
    "make_pp_trainer",
    "merge_layer_params",
    "pipeline_encode",
    "split_layer_params",
]
