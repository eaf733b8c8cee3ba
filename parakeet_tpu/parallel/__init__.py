from parakeet_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
)

# pipeline.py pulls in the training stack (optax) — import lazily so
# inference-only installs (deps: jax + numpy) can keep using mesh/sharding.
_PIPELINE_NAMES = (
    "make_pp_trainer",
    "merge_layer_params",
    "pipeline_encode",
    "split_layer_params",
)


def __getattr__(name):
    if name in _PIPELINE_NAMES:
        from parakeet_tpu.parallel import pipeline

        return getattr(pipeline, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "batch_sharding",
    *_PIPELINE_NAMES,
]
