"""Pipeline parallelism (GPipe) over the conformer stack.

The reference has no distribution of any kind (SURVEY §2.6); this module is
the TPU-native pipeline seam: the encoder's conformer blocks are sharded
over a 'pipe' mesh axis — each device holds ``num_layers / P`` blocks'
weights — and microbatches stream through the stages with
``jax.lax.ppermute`` activation handoffs riding ICI. The schedule is the
classic GPipe fill-drain: ``n_micro + P - 1`` steps, stage *s* processing
microbatch ``t - s`` at step *t*; the backward pipeline falls out of
autodiff through the ``lax.scan`` (ppermute transposes to the reverse
shift), with ``jax.checkpoint`` around each stage so the backward pass
rematerializes block activations instead of storing every scan step.

At the reference's model sizes (110M-600M) a whole encoder fits one chip,
so PP buys nothing there — this seam exists for scale beyond that (and the
driver's multi-chip dry run exercises it). It composes with data
parallelism (mesh ('data', 'pipe')); TP/SP remain the orthogonal seams in
parallel/mesh.py. Expert parallelism has no seam here on purpose: nothing
in the model family routes tokens (no MoE), so there is no expert axis to
shard.

Parameter layout: the flat schema dict's per-layer keys
(``encoder_.layers_.{i}.{suffix}``) are stacked into ``(L, …)`` arrays
keyed by suffix (`split_layer_params`), sharded ``PS('pipe', …)`` on the
layer dim; everything else stays flat and replicated. `merge_layer_params`
restores the exact schema for checkpoint export.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from parakeet_tpu.models.encoder import (
    conformer_block,
    encode_prologue,
    encoded_lengths,
)
from parakeet_tpu.params import Params

LAYER_PREFIX = "encoder_.layers_."


def split_layer_params(params: dict, num_layers: int) -> tuple[dict, dict]:
    """Flat schema dict → (stacked {suffix: (L, …)}, rest flat dict)."""
    per_layer: list[dict] = [{} for _ in range(num_layers)]
    rest: dict = {}
    for k, v in params.items():
        if k.startswith(LAYER_PREFIX):
            idx, suffix = k[len(LAYER_PREFIX):].split(".", 1)
            per_layer[int(idx)][suffix] = v
        else:
            rest[k] = v
    if not all(per_layer[0].keys() == layer.keys() for layer in per_layer):
        raise ValueError("conformer layers are not schema-uniform; cannot stack")
    stacked = {
        s: jnp.stack([jnp.asarray(per_layer[i][s]) for i in range(num_layers)])
        for s in sorted(per_layer[0])
    }
    return stacked, rest


def merge_layer_params(stacked: dict, rest: dict) -> dict:
    """Inverse of `split_layer_params` — exact schema keys restored."""
    out = dict(rest)
    for suffix, v in stacked.items():
        for i in range(v.shape[0]):
            out[f"{LAYER_PREFIX}{i}.{suffix}"] = v[i]
    return out


def _layer_spec(v) -> PS:
    return PS("pipe", *([None] * (v.ndim - 1)))


def pipeline_encode(
    stacked: dict,
    rest: dict,
    enc_cfg,
    features: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    *,
    mesh: Mesh,
    n_micro: int,
) -> jnp.ndarray:
    """(B, T, mel) → (B, T', D) with the conformer stack pipelined over the
    mesh's 'pipe' axis. Numerically identical to `fastconformer_encode`
    (same blocks in the same order; microbatching is per-example exact).

    Must be called under `jit` with `mesh` active. The local batch per
    'data' shard must divide `n_micro`.
    """
    if "pipe" not in dict(mesh.shape):
        raise ValueError(
            "mesh has no 'pipe' axis; build one with make_mesh(pipeline_parallel=…)"
        )
    pp = dict(mesh.shape)["pipe"]
    if enc_cfg.num_layers % pp:
        raise ValueError(f"{enc_cfg.num_layers} layers not divisible by pipe={pp}")

    # Shard the subsampling batch over BOTH mesh axes. Besides using every
    # device for the conv stack, this works around a GSPMD transpose bug in
    # this XLA version: a feature_group_count (depthwise) conv whose
    # operands are REPLICATED over a mesh axis gets its weight-gradient
    # psum'ed over that axis too — dw1/dw2 grads came out exactly
    # pipe-size× too large (verified 2× at pp=2, 4× at pp=4; plain convs
    # unaffected). With the batch sharded over ('data','pipe') nothing is
    # replicated and the transpose is exact (tests/test_pipeline.py pins
    # gradient equality with the dense path).
    features = jax.lax.with_sharding_constraint(
        features, NamedSharding(mesh, PS(("data", "pipe"), None, None))
    )
    x, pos_emb, mask, pad_mask, _ = encode_prologue(
        Params(rest).sub("encoder_"), enc_cfg, features, mel_lengths
    )

    def stage(layers_local: dict, x, pos_emb, mask, pad_mask):
        idx = jax.lax.axis_index("pipe")
        blocal, t, d = x.shape
        if blocal % n_micro:
            raise ValueError(
                f"local batch {blocal} not divisible by n_micro={n_micro}"
            )
        mb = blocal // n_micro
        xm = x.reshape(n_micro, mb, t, d)
        maskm = mask.reshape(n_micro, mb, *mask.shape[1:])
        padm = pad_mask.reshape(n_micro, mb, t)
        n_local = next(iter(layers_local.values())).shape[0]

        @jax.checkpoint
        def apply_stage(xs, m_mask, m_pad):
            # Python loop (static n_local): no scan over layers, so the
            # blocks stay plain XLA ops (xla_only also hard-disables every
            # Pallas branch — kernels can't run inside shard_map bodies).
            for j in range(n_local):
                pj = Params({k: v[j] for k, v in layers_local.items()})
                xs = conformer_block(
                    pj, xs, pos_emb, enc_cfg, m_mask, m_pad, None, xla_only=True
                )
            return xs

        def step_fn(carry, t_step):
            state, outs = carry
            m = t_step - idx  # microbatch this stage works on at t_step
            mi = jnp.clip(m, 0, n_micro - 1)
            inp = jnp.where(idx == 0, xm[mi], state)
            out = apply_stage(inp, maskm[mi], padm[mi])
            live = (m >= 0) & (m < n_micro) & (idx == pp - 1)
            outs = outs.at[mi].set(jnp.where(live, out, outs[mi]))
            # shift every stage's activation to its successor; stage 0
            # receives zeros (it feeds from xm instead)
            nxt = jax.lax.ppermute(
                out, "pipe", [(i, i + 1) for i in range(pp - 1)]
            )
            return (nxt, outs), None

        init = (
            jnp.zeros((mb, t, d), x.dtype),
            jnp.zeros((n_micro, mb, t, d), x.dtype),
        )
        (_, outs), _ = jax.lax.scan(
            step_fn, init, jnp.arange(n_micro + pp - 1)
        )
        # only the last stage holds real outputs; broadcast to the whole
        # pipe group so downstream heads see a replicated encoding
        outs = jax.lax.psum(
            jnp.where(idx == pp - 1, outs, jnp.zeros_like(outs)), "pipe"
        )
        return outs.reshape(blocal, t, d)

    batch_dims = lambda nd: PS("data", *([None] * (nd - 1)))  # noqa: E731
    gpipe = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(
            {k: _layer_spec(v) for k, v in stacked.items()},
            batch_dims(3),
            PS(None, None),
            batch_dims(mask.ndim),
            batch_dims(2),
        ),
        out_specs=batch_dims(3),
        check_vma=False,
    )
    return gpipe(stacked, x, pos_emb, mask, pad_mask)


def make_pp_trainer(
    cfg,
    params: dict,
    mesh: Mesh,
    *,
    n_micro: int = 2,
    learning_rate: float = 1e-4,
    loss: str = "hybrid",
    sigma: float = 0.0,
    ctc_weight: float = 0.3,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int | None = None,
    clip_norm: float | None = None,
):
    """Pipeline-parallel trainer over a ('data', 'pipe') mesh.

    Returns (state, step, place_batch, export_params): `state.params` is
    {'layers': stacked-and-pipe-sharded, 'rest': replicated flat dict};
    `export_params(state.params)` restores the reference checkpoint schema.
    Loss values and parameter updates match the plain `make_sharded_trainer`
    exactly (pinned by tests/test_pipeline.py).
    """
    import optax

    from parakeet_tpu.train import TrainState, encoded_loss_fn, make_lr_schedule

    axes = dict(mesh.shape)
    if axes.get("model", 1) > 1 or axes.get("seq", 1) > 1:
        raise ValueError(
            "pipeline trainer composes with data parallelism only "
            f"(mesh axes {axes}); use make_mesh(pipeline_parallel=…)"
        )
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)
    with mesh:
        stacked = {
            k: jax.device_put(v, NamedSharding(mesh, _layer_spec(v)))
            for k, v in stacked.items()
        }
        rest = {
            # copy=True: the jitted step donates its params, and device_put
            # of an already-placed array can alias the caller's buffer —
            # never invalidate the params dict we were handed
            k: jax.device_put(jnp.array(v, copy=True), NamedSharding(mesh, PS()))
            for k, v in rest.items()
        }
    train_params = {"layers": stacked, "rest": rest}
    optimizer = optax.adamw(make_lr_schedule(
        learning_rate, schedule=schedule, warmup_steps=warmup_steps,
        decay_steps=decay_steps,
    ))
    if clip_norm is not None:
        # mirrors make_sharded_trainer: clip changes the opt-state treedef,
        # so a run is only resumable with the same clip setting
        optimizer = optax.chain(optax.clip_by_global_norm(clip_norm), optimizer)
    with mesh:
        opt_state = jax.jit(optimizer.init)(train_params)

    def loss_fn(tp, batch):
        enc = pipeline_encode(
            tp["layers"], tp["rest"], cfg.encoder,
            batch["features"], batch["mel_lengths"],
            mesh=mesh, n_micro=n_micro,
        )
        enc_lens = jnp.minimum(encoded_lengths(batch["mel_lengths"]), enc.shape[1])
        return encoded_loss_fn(
            tp["rest"], cfg, enc, enc_lens, batch,
            loss=loss, sigma=sigma, ctc_weight=ctc_weight,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(tp, opt_state, batch):
        lval, grads = jax.value_and_grad(loss_fn)(tp, batch)
        updates, opt_state = optimizer.update(grads, opt_state, tp)
        tp = optax.apply_updates(tp, updates)
        return tp, opt_state, lval

    def place_batch(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            out[k] = jax.device_put(
                arr, NamedSharding(mesh, PS("data", *([None] * (arr.ndim - 1))))
            )
        return out

    def export_params(tp) -> dict:
        return merge_layer_params(
            jax.device_get(tp["layers"]), jax.device_get(tp["rest"])
        )

    return TrainState(train_params, opt_state), step, place_batch, export_params


__all__ = [
    "split_layer_params",
    "merge_layer_params",
    "pipeline_encode",
    "make_pp_trainer",
]
