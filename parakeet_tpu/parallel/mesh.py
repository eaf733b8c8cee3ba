"""Device mesh + sharding layer.

The reference has NO distribution of any kind (SURVEY §2.6/§5.8 — no
process group, no collectives, explicit Metal copies only). The TPU-native
equivalent is this module: a (data, model) `jax.sharding.Mesh`, named
shardings for batch data parallelism and tensor parallelism over the
FFN/attention-head dimensions, with XLA inserting the ICI collectives.

At 110M-600M params, DP is the throughput lever (batched clips per chip)
and TP is provided as a config-level seam (SURVEY: "multi-chip batch DP is
config, not code"). Sequence parallelism is likewise a config seam: a
'seq' mesh axis + `activation_sharding` constraint on the encoder's
(B, T, D) activations — XLA/GSPMD inserts the halo exchanges (depthwise
conv) and K/V gathers (attention) over ICI. Pipeline parallelism lives in
parallel/pipeline.py (GPipe over the conformer stack on a 'pipe' axis) —
unnecessary at 110M-600M where a whole encoder fits one chip, provided as
the scale-out seam. EP is deliberately absent: nothing in the model family
routes tokens (no MoE), so there is no expert axis to shard (SURVEY §5.7).
"""

from __future__ import annotations

import re
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
    seq_parallel: int = 1,
    pipeline_parallel: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh over the first n devices.

    seq_parallel > 1 adds a 'seq' axis — ('data', 'seq', 'model'), model
    innermost so TP collectives ride the tightest ICI links — for sharding
    encoder activations over time (see `activation_sharding`).

    pipeline_parallel > 1 builds a ('data', 'pipe') mesh instead, for the
    GPipe trainer in parallel/pipeline.py (pipe innermost so the stage
    handoffs ride neighbor ICI links); it composes with data parallelism
    only — TP/SP are the orthogonal seams."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    devices = np.asarray(devices[:n_devices])
    if pipeline_parallel > 1:
        if model_parallel > 1 or seq_parallel > 1:
            raise ValueError(
                "pipeline_parallel composes with data parallelism only"
            )
        if n_devices % pipeline_parallel:
            raise ValueError(
                f"{n_devices} devices not divisible by"
                f" pipeline_parallel={pipeline_parallel}"
            )
        grid = devices.reshape(n_devices // pipeline_parallel, pipeline_parallel)
        return Mesh(grid, ("data", "pipe"))
    if n_devices % (model_parallel * seq_parallel) != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by model_parallel={model_parallel}"
            f" × seq_parallel={seq_parallel}"
        )
    if seq_parallel > 1:
        grid = devices.reshape(
            n_devices // (model_parallel * seq_parallel), seq_parallel, model_parallel
        )
        return Mesh(grid, ("data", "seq", "model"))
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# Tensor-parallel partition rules over the converter-schema key names.
# (regex, PartitionSpec) — first match wins; default replicated.
_TP_RULES: list[tuple[str, PS]] = [
    # Macaron FFN: split the intermediate dim
    (r"\.ffn[12]_\.fc1_\.weight$", PS("model", None)),
    (r"\.ffn[12]_\.fc1_\.bias$", PS("model")),
    (r"\.ffn[12]_\.fc2_\.weight$", PS(None, "model")),
    # Attention: split heads (rows of q/k/v, cols of out)
    (r"\.mha_\.[qkv]_proj\.weight$", PS("model", None)),
    (r"\.mha_\.[qkv]_proj\.bias$", PS("model")),
    (r"\.mha_\.out_proj\.weight$", PS(None, "model")),
    (r"\.pos_proj_\.weight$", PS("model", None)),
    # Conv module pointwise convs: split channels
    (r"\.pointwise_conv1_\.weight$", PS("model", None, None)),
    (r"\.pointwise_conv1_\.bias$", PS("model")),
    # Sortformer transformer FFN
    (r"\.fc1_\.weight$", PS("model", None)),
    (r"\.fc1_\.bias$", PS("model")),
    (r"\.fc2_\.weight$", PS(None, "model")),
    # Joint / CTC heads: split the vocab rows
    (r"(label_proj_|out_proj_)\.weight$", PS("model", None)),
    (r"(label_proj_|out_proj_)\.bias$", PS("model")),
    (r"ctc_decoder_\.proj_\.weight$", PS("model", None, None)),
    (r"ctc_decoder_\.proj_\.bias$", PS("model")),
    # Prediction net embedding: split vocab rows
    (r"prediction_\.embed_\.weight$", PS("model", None)),
]


# Vocab-dimension rules where padding to the next multiple of
# model_parallel is semantics-preserving: appended weight rows are zero and
# appended bias lanes are -1e9, so the extra logit lanes carry probability
# exp(-1e9)=0 — log_softmax, argmax, top-k beams, and the losses are exactly
# unchanged, and blank stays at index vocab_size-1 (padding is appended
# AFTER it). Without this, the flagship vocab sizes (1025/8193, both odd)
# made every vocab-dim TP rule silently replicate (r2 verdict).
_VOCAB_PAD_PATTERN = re.compile(
    r"((label_proj_|out_proj_)\.(weight|bias)$"
    r"|ctc_decoder_\.proj_\.(weight|bias)$"
    r"|prediction_\.embed_\.weight$)"
)

#: logit value for padded vocab lanes — large enough that exp(pad - max)
#: is exactly 0 in f32/bf16, small enough to stay finite
_PAD_BIAS = -1e9


def pad_vocab_dim(key: str, v, tp: int):
    """Pad the vocab ('model'-sharded) dim of an eligible param to divide
    tp. Returns the padded array or None when not eligible/needed."""
    if tp <= 1 or not _VOCAB_PAD_PATTERN.search(key):
        return None
    vocab = v.shape[0]
    pad = (-vocab) % tp
    if pad == 0:
        return None
    widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
    fill = _PAD_BIAS if key.endswith(".bias") else 0.0
    return jnp.pad(jnp.asarray(v), widths, constant_values=fill)


def unpad_vocab_params(params: dict, vocab_size: int, ctc_vocab_size: int | None = None) -> dict:
    """Slice vocab-padded params back to the schema sizes (for exporting a
    reference-schema checkpoint after sharded training/inference)."""
    out = {}
    for k, v in params.items():
        if _VOCAB_PAD_PATTERN.search(k):
            size = ctc_vocab_size if (ctc_vocab_size and k.startswith("ctc_decoder_")) else vocab_size
            out[k] = v[:size]
        else:
            out[k] = v
    return out


def param_sharding_rules(key: str, mesh: Mesh) -> NamedSharding:
    """Sharding for one parameter by schema name; replicated if no rule hits
    or the sharded dim doesn't divide."""
    if dict(mesh.shape).get("model", 1) > 1:
        for pattern, spec in _TP_RULES:
            if re.search(pattern, key):
                return NamedSharding(mesh, spec)
    return NamedSharding(mesh, PS())


def shard_params(params: dict, mesh: Mesh, pad_vocab: bool = True) -> dict:
    """Place a flat param dict onto the mesh (TP split where rules apply).

    pad_vocab: vocab-dim params (joint/CTC heads, prediction embedding)
    whose leading dim doesn't divide model_parallel are first padded with
    semantics-preserving rows (`pad_vocab_dim`) so the flagship odd vocab
    sizes (1025/8193) actually shard instead of silently replicating.
    Export padded params through `unpad_vocab_params`.

    Any other TP rule whose sharded dim doesn't divide mesh['model'] falls
    back to replication — with a warning, so a silent rule regression can't
    pass as "sharded" (every current test would otherwise stay green if the
    rules stopped matching)."""
    tp = dict(mesh.shape).get("model", 1)
    out = {}
    for k, v in params.items():
        if pad_vocab:
            padded = pad_vocab_dim(k, v, tp)
            if padded is not None:
                v = padded
        sh = param_sharding_rules(k, mesh)
        spec = sh.spec
        # skip TP split when the dimension doesn't divide evenly
        ok = True
        for dim, name in enumerate(spec):
            if name == "model" and v.shape[dim] % tp != 0:
                ok = False
        if not ok:
            warnings.warn(
                f"TP rule for {k!r} ({spec}) skipped: shape {tuple(v.shape)} "
                f"does not divide model_parallel={tp}; replicating",
                stacklevel=2,
            )
        out[k] = jax.device_put(v, sh if ok else NamedSharding(mesh, PS()))
    return out


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading arrays shard over 'data'."""
    return NamedSharding(mesh, PS("data", *([None] * (ndim - 1))))


def activation_sharding(mesh: Mesh | None) -> NamedSharding | None:
    """(B, T, D) encoder-activation sharding for sequence parallelism:
    batch over 'data', time over 'seq'. None when the mesh has no 'seq'
    axis (> 1) — callers then skip the constraint entirely."""
    if mesh is not None and dict(mesh.shape).get("seq", 1) > 1:
        return NamedSharding(mesh, PS("data", "seq", None))
    return None


__all__ = [
    "make_mesh",
    "pad_vocab_dim",
    "unpad_vocab_params",
    "param_sharding_rules",
    "shard_params",
    "batch_sharding",
    "activation_sharding",
]
