"""Shared train-CLI machinery (parakeet-train / parakeet-train-diar):
mesh-aware resume placement and the step/log/checkpoint loop. One
implementation so fixes to the sharding-restore subtleties or the loop
cadence can't diverge between the CLIs."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from parakeet_tpu.checkpoint import save_train_state
from parakeet_tpu.train import TrainState


def place_train_state(mesh, params_host, opt_host, step: int, ref_state: TrainState) -> TrainState:
    """Re-apply a trainer's device placement to host-loaded state: committing
    loaded arrays with the fresh state's shardings preserves the TP/seq
    layout the step_fn was compiled for (else a 600m resume replicates
    params+opt state on every chip). Leaves whose fresh sharding isn't a
    NamedSharding (e.g. the optimizer's scalar count, committed to one
    device by jit) are replicated over the whole mesh so every input lives
    on the same device set."""
    from jax.sharding import NamedSharding, PartitionSpec

    def _placed(host, ref):
        sh = ref.sharding
        if not isinstance(sh, NamedSharding):
            sh = NamedSharding(mesh, PartitionSpec())
        return jax.device_put(jnp.asarray(host), sh)

    params = jax.tree.map(_placed, params_host, ref_state.params)
    opt = jax.tree.map(_placed, opt_host, ref_state.opt_state)
    return TrainState(params, opt, step)


def run_training(
    mesh,
    loader,
    state: TrainState,
    step_fn,
    place_batch,
    *,
    steps: int,
    log_every: int,
    checkpoint_dir=None,
    checkpoint_every: int = 100,
    as_schema=lambda p: p,
):
    """Run optimizer steps from `state.step` to `steps`, logging every
    `log_every` and checkpointing every `checkpoint_every` (params pass
    through `as_schema` — e.g. the pipeline trainer's {layers, rest} →
    flat-schema merge — so checkpoints stay reference-shaped). Returns
    (params, opt_state, step)."""
    params, opt_state, step = state.params, state.opt_state, state.step
    t0 = time.perf_counter()
    with mesh:
        while step < steps:
            for batch in loader:
                if step >= steps:
                    break
                params, opt_state, lval = step_fn(params, opt_state, place_batch(batch))
                step += 1
                if step % log_every == 0 or step == steps:
                    dt = time.perf_counter() - t0
                    print(f"step {step}/{steps}  loss {float(lval):.4f}  "
                          f"{dt / max(1, step - state.step):.2f}s/step", file=sys.stderr)
                if checkpoint_dir and step % checkpoint_every == 0:
                    save_train_state(checkpoint_dir, as_schema(params), opt_state, step)
    return params, opt_state, step


__all__ = ["place_train_state", "run_training"]
